package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounded top-k accumulator as a typed `Aggregator` (SURVEY.md §2.B
  * `udaf_topk`). Buffer is a sorted-descending Seq capped at k, so state
  * is O(k) per group on every executor and merges are O(k) — the shape a
  * 100 TB grouped top-k needs (no per-group collect_list blowup).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  override def zero: Seq[Double] = Seq.empty

  private def trim(s: Seq[Double]): Seq[Double] = s.sorted(Ordering[Double].reverse).take(k)

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.size < k || v > buf.last) trim(buf :+ v) else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = trim(a ++ b)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** UDAF / UDTF query surface (SURVEY.md §2.B "UDF / UDAF / UDTF"). */
object UdxOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Top-3 order totalprices per status via the typed Aggregator, flattened
    * with posexplode so the DuckDB row_number oracle can hash-match it. */
  def udafTopk(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKAggregator(3))
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(topk(col("o_totalprice")).as("topv"))
      .select(col("o_orderstatus"), posexplode(col("topv")).as(Seq("pos", "v")))
      .select(col("o_orderstatus"), col("pos").cast("int").as("pos"),
              round(col("v"), 2).as("price"))
      .orderBy(col("o_orderstatus").asc, col("pos").asc)
  }

  /** 1->N generator: explode(split) tokenizer (the built-in Generator path
    * — Spark's UDTF surface). Restricted to doc_id <= 20 to keep the
    * oracle output bounded. */
  def udtfTokenize(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") <= 20)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy(col("doc_id").asc, col("token").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udaf_topk" -> (udafTopk _),
    "udtf_tokenize" -> (udtfTokenize _))

  val oracle: Map[String, String] = Map(
    "udaf_topk" ->
      """SELECT o_orderstatus, pos, price FROM (
        |  SELECT o_orderstatus,
        |    CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC NULLS LAST) - 1 AS INTEGER) AS pos,
        |    round(o_totalprice, 2) AS price
        |  FROM orders) t
        |WHERE pos < 3
        |ORDER BY o_orderstatus ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,
    "udtf_tokenize" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id <= 20
        |ORDER BY doc_id ASC NULLS FIRST, token ASC NULLS FIRST""".stripMargin)
}
