package graft.functions

import scala.collection.mutable

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the Misra–Gries kernels (SURVEY.md §5.2): the
  * survival guarantee and the size bound must hold for ARBITRARY streams,
  * orderings, k, and merge splits — not just the crafted case in
  * CorpusOpsSpec. */
object MisraGriesPropertySpec extends Properties("MisraGries") {

  // streams over a small alphabet with random multiplicities so heavy
  // hitters actually occur; shuffled so orderings vary per sample
  private val genStream: Gen[List[String]] = for {
    nTerms <- Gen.chooseNum(1, 20)
    counts <- Gen.listOfN(nTerms, Gen.chooseNum(1, 60))
    stream <- {
      val items = counts.zipWithIndex.flatMap { case (c, i) => List.fill(c)(s"t$i") }
      Gen.const(items)
    }
    shuffled <- Gen.const(scala.util.Random.shuffle(stream))
  } yield shuffled

  private val genK: Gen[Int] = Gen.chooseNum(1, 12)

  private def runSketch(stream: Seq[String], k: Int): mutable.HashMap[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    stream.foreach(MisraGriesAgg.add(buf, _, k))
    buf
  }

  private def heavyHitters(stream: Seq[String], k: Int): Set[String] = {
    val n = stream.size
    stream.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * (k + 1) > n => t
    }.toSet
  }

  property("size bound: sketch never exceeds k counters") =
    forAll(genStream, genK) { (s, k) =>
      runSketch(s, k).size <= k
    }

  property("survival: every term with freq > n/(k+1) is in the sketch") =
    forAll(genStream, genK) { (s, k) =>
      val cands = runSketch(s, k).keySet
      heavyHitters(s, k).subsetOf(cands)
    }

  property("mergeable: guarantee survives an arbitrary split + merge") =
    forAll(genStream, genK, Gen.chooseNum(0, 100)) { (s, k, cutPct) =>
      val cut = s.size * cutPct / 100
      val (a, b) = s.splitAt(cut)
      val bufA = runSketch(a, k)
      val bufB = runSketch(b, k)
      MisraGriesAgg.mergeInto(bufA, bufB, k)
      bufA.size <= k && heavyHitters(s, k).subsetOf(bufA.keySet)
    }

  property("counts are lower bounds within n/(k+1) of the truth") =
    forAll(genStream, genK) { (s, k) =>
      val exact = s.groupBy(identity).map { case (t, occ) => t -> occ.size.toLong }
      val slack = s.size.toLong / (k + 1)
      runSketch(s, k).forall { case (t, c) =>
        c <= exact(t) && c >= exact(t) - slack
      }
    }
}
