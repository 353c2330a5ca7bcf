package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per JVM (suites run sequentially in the
  * forked test JVM; getOrCreate reuses the first session). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // r20 (ADVICE r19 #4): tests run under the SAME tuned AQE posture as
    // the bench and the oracle gate (GraftSession is the one definition
    // site), so sbt test exercises the configuration that ships.
    val s = GraftSession.tuned(SparkSession.builder())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // r12: SQL views need the extensions-injected analyzer rule
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
