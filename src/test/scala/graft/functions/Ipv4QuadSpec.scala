package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Native-expression tests: interpreted eval vs generated code must agree,
  * and both must match the composed-builtin formulation. */
class Ipv4QuadSpec extends SparkTestBase {

  private def run(): Seq[(Long, String)] = {
    import spark.implicits._
    Seq(0L, 1L, 255L, 256L, 0x0A000001L, 0xFFFFFFFFL, 0xC0A80101L).toDF("x")
      .select(col("x"), Ipv4Quad.ip_quad(col("x")).as("ip"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("codegen and interpreted paths agree and format correctly") {
    val expected = Seq(
      0L -> "0.0.0.0", 1L -> "0.0.0.1", 255L -> "0.0.0.255", 256L -> "0.0.1.0",
      0x0A000001L -> "10.0.0.1", 0xC0A80101L -> "192.168.1.1",
      0xFFFFFFFFL -> "255.255.255.255").sortBy(_._1)
    val withCodegen = run()
    assert(withCodegen == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null input yields null output") {
    import spark.implicits._
    val got = Seq[Option[Long]](Some(5L), None).toDF("x")
      .select(Ipv4Quad.ip_quad(col("x"))).collect().map(r => Option(r.get(0)))
    assert(got.count(_.isEmpty) == 1)
  }

  test("SQL registration of the native function") {
    spark.sessionState.functionRegistry.registerFunction(
      Ipv4Quad.functionDescription._1,
      Ipv4Quad.functionDescription._2,
      Ipv4Quad.functionDescription._3)
    val r = spark.sql("SELECT ip_quad(167772161)").head().getString(0)
    assert(r == "10.0.0.1")
  }
}
