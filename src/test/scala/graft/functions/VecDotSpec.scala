package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** VecDot: bitwise agreement with the higher-order-function chain it
  * replaced, NULL semantics, and codegen/interpreted parity. */
class VecDotSpec extends SparkTestBase {
  import VecDot.{vec_dot, vec_norm}

  private def vecsDf = {
    import spark.implicits._
    // deterministic pseudo-random doubles, incl. negatives and magnitudes
    val rows = (0 until 200).map { i =>
      val a = Array.tabulate(64)(j => math.sin(i * 64 + j) * (1 + j % 7))
      val b = Array.tabulate(64)(j => math.cos(i * 64 + j) * (1 + j % 5))
      (i, a, b)
    }
    rows.toDF("id", "a", "b")
  }

  test("bitwise-equal to aggregate(zip_with(_*_)) sequential fold") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
                        lit(0.0), (acc, v) => acc + v)
    val diff = vecsDf
      .select(vec_dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
    assert(diff.isEmpty)
  }

  test("norm matches sqrt of self-dot; known value") {
    import spark.implicits._
    val df = Seq((Array(3.0, 4.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(vec_norm(col("a")), vec_dot(col("a"), col("b"))).collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 11.0)
  }

  test("NULL semantics: null array, length mismatch, null element") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)),
        |  (array(1.0d, 2.0d), array(1.0d)),
        |  (array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) t(a, b)""".stripMargin)
    val out = df.select(vec_dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval (codegen off) equals codegen'd result") {
    val dots = vecsDf.select(col("id"), vec_dot(col("a"), col("b")).as("d"))
    val on = dots.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val off = dots.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(on == off)
    }
  }

  test("registered for SQL via GraftExtensions function registry") {
    VecDot.functionDescription // touch; real registration exercised below
    spark.sessionState.functionRegistry.registerFunction(
      VecDot.functionDescription._1, VecDot.functionDescription._2,
      VecDot.functionDescription._3)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
