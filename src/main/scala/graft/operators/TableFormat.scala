package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot table format (r6) — `sink_versioned`'s atomic pointer grown
  * into the real protocol underneath Delta/Iceberg/Hudi, hand-rolled on
  * nothing but parquet + the Hadoop FS API:
  *
  *  - every commit writes its data files into an IMMUTABLE per-commit
  *    directory, then a MANIFEST (`_manifests/v{N}.manifest`, one data
  *    file path per line) naming exactly the files the snapshot contains
  *    — an append commit's manifest = parent's file list + the new files
  *    (data files are never rewritten or moved);
  *  - `_CURRENT` resolves the live version and is published by a single
  *    overwrite-rename (FileContext, Rename.OVERWRITE — no
  *    delete-then-rename window);
  *  - readers resolve manifest → file list and read THOSE FILES, never
  *    the directory: a concurrent half-finished commit, a failed job's
  *    leftovers, or any other orphan under `data/` is invisible until a
  *    manifest names it (directory-listing reads have no such isolation
  *    — TableFormatSpec plants an orphan and proves the difference);
  *  - time travel = read manifest v(N-k); nothing is ever deleted by
  *    commits, so every version stays readable.
  *
  * Scale notes (100 TB): commits move METADATA only — a manifest is one
  * small file regardless of data size, the pointer swap is one rename;
  * snapshot reads plan from the manifest's explicit file list (no
  * eventually-consistent directory listing, the property object stores
  * punish). Production formats shard manifests and add column stats for
  * file skipping; the commit/visibility protocol is the same.
  */
object TableFormat {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(spark: SparkSession, path: String, body: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    out.write(body.getBytes(StandardCharsets.UTF_8))
    out.close()
    val fc = FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(path), Options.Rename.OVERWRITE)
  }

  private def readFile(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    val s = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    in.close()
    s
  }

  /** Commit `df` as snapshot `version`. `parent = Some(v)` makes this an
    * APPEND commit (new manifest = v's files + the new ones); `None`
    * starts the table (or replaces it wholesale). Returns the version. */
  def commit(spark: SparkSession, base: String, df: DataFrame, version: Int,
             parent: Option[Int]): Int = {
    val commitDir = s"$base/data/c$version"
    df.write.mode("overwrite").parquet(commitDir)
    val f = fs(spark, base)
    val newFiles = f.listStatus(new Path(commitDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    val parentFiles = parent.toSeq.flatMap(v => manifestFiles(spark, base, v))
    writeFile(spark, s"$base/_manifests/v$version.manifest",
      (parentFiles ++ newFiles).mkString("\n"))
    writeFile(spark, s"$base/_CURRENT", version.toString) // atomic publish
    version
  }

  /** The data files snapshot `version` consists of. */
  def manifestFiles(spark: SparkSession, base: String, version: Int): Seq[String] =
    readFile(spark, s"$base/_manifests/v$version.manifest")
      .split("\n").toSeq.filter(_.nonEmpty)

  def currentVersion(spark: SparkSession, base: String): Int =
    readFile(spark, s"$base/_CURRENT").trim.toInt

  /** Read a snapshot: `version = None` resolves `_CURRENT`. Plans from
    * the manifest's explicit file list — never a directory listing. */
  def readSnapshot(spark: SparkSession, base: String,
                   version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, base))
    spark.read.parquet(manifestFiles(spark, base, v): _*)
  }

  /** `table_timetravel`: v1 = even docs; v2 = append of the odd docs
    * (manifest reuse — v1's files are NOT rewritten); output = per-version
    * aggregates read through the manifests, v1 pinned (time travel) and
    * v2 via the pointer. The oracle recomputes both from the source. */
  def tableTimetravel(spark: SparkSession, dir: String): DataFrame = {
    val base = s"${Tables.scratchDir}/snap_table"
    fs(spark, base).delete(new Path(base), true) // deterministic rebuild
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    commit(spark, base, docs.filter(col("doc_id") % 2 === 0), 1, parent = None)
    commit(spark, base, docs.filter(col("doc_id") % 2 === 1), 2, parent = Some(1))
    def snap(label: String, version: Option[Int]) =
      readSnapshot(spark, base, version)
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).cast("long").as("sum_chars"))
        .select(lit(label).as("version"), col("n_docs"), col("sum_chars"))
    snap("v1", Some(1)).unionByName(snap("v2", None))
      .orderBy(col("version").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "table_timetravel" -> (tableTimetravel _))

  val oracle: Map[String, String] = Map(
    "table_timetravel" ->
      """SELECT 'v1' AS version, count(1) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 'v2', count(1), CAST(sum(n_chars) AS BIGINT) FROM documents
        |ORDER BY version ASC NULLS FIRST""".stripMargin)
}
