package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (JVM-wide — Spark startup
  * dominates test wall time otherwise). Config mirrors Verify/Bench so
  * tests exercise the same session semantics the driver verifies.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  /** sf0.001 testdata dir (smoke scale). */
  val sfDir = "/root/testdata/sf0.001"
  /** Canonical 9-column fixture CSV header (single source of truth for
    * every test that writes fixture-shaped CSVs; deliberately corrupted
    * variants stay inline where used).
    */
  val fixtureHeader =
    "timestamp,line_id,batch_number,product_code,temperature_c,pressure_kpa,humidity_pct,operator_id,defect_count\n"
}
