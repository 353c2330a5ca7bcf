package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property: AsOfJoinExec agrees with a trivial in-memory as-of reference
  * on random inputs (small key/time domains force collisions, ties, and
  * empty-match cases across shuffle partitions). */
object AsOfJoinPropertySpec extends Properties("AsOfJoinExec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val genRows = for {
    nL <- Gen.chooseNum(0, 30)
    nR <- Gen.chooseNum(0, 30)
    ls <- Gen.listOfN(nL, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 20L)))
    rs <- Gen.listOfN(nR, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 20L)))
  } yield (ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
           // unique (k, t) on the right so the expected match is unambiguous
           rs.distinct.map { case (k, t) => (k, t, k * 1000 + t) })

  property("matches the in-memory as-of reference") = forAll(genRows) { case (ls, rs) =>
    import spark.implicits._
    val l = ls.toDF("k", "t", "lid")
    val r = rs.toDF("rk", "rt", "rid")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    val expected = ls.map { case (k, t, lid) =>
      val m = rs.filter(x => x._1 == k && x._2 <= t)
      lid -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toMap
    got == expected
  }
}
