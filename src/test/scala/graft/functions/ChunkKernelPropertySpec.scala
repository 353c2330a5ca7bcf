package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the strided chunk kernel (SURVEY.md §5.2): count,
  * content, and determinism must hold for ARBITRARY token streams and
  * chunk sizes, not just the corpus the oracle gates. */
object ChunkKernelPropertySpec extends Properties("ChunkMd5Keys") {

  private val genTokens: Gen[List[String]] = for {
    n <- Gen.chooseNum(0, 120)
    toks <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yz"))
  } yield toks

  private val genSize: Gen[Int] = Gen.chooseNum(1, 20)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def kernel(text: String, size: Int): Seq[String] = {
    val arr = HashKernels.chunkMd5Keys(UTF8String.fromString(text), size)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("emits exactly floor(n/size) keys") = forAll(genTokens, genSize) { (toks, size) =>
    val text = toks.mkString(" ")
    // "" tokenizes as one empty token (split semantics shared with the
    // gram kernel and Spark's split) — count from the reconstructed text
    val n = text.split(" ", -1).length
    kernel(text, size).size == n / size
  }

  property("key i is the md5 of tokens [i*size, (i+1)*size)") =
    forAll(genTokens, genSize) { (toks, size) =>
      val got = kernel(toks.mkString(" "), size)
      got.zipWithIndex.forall { case (h, i) =>
        h == md5hex(toks.slice(i * size, (i + 1) * size).mkString(" "))
      }
    }

  property("identical chunk content yields identical keys across documents") =
    forAll(genTokens, genSize) { (toks, size) =>
      val doubled = toks ++ toks
      val a = kernel(toks.mkString(" "), size)
      val b = kernel(doubled.mkString(" "), size)
      // a doc repeated end-to-end shares all of the original's chunks
      // when the boundary alignment is preserved (size divides n)
      toks.size % size != 0 || a.forall(b.contains)
    }
}
