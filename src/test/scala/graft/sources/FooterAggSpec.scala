package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Parquet AGGREGATE pushdown — the footer-only scan path: COUNT /
  * MIN / MAX over an unfiltered parquet table can be answered from
  * row-group statistics without decoding a single data page. At
  * 100 TB this turns "how many rows / what's the value range" from a
  * full scan into a metadata read — the fourth skipping mechanism
  * next to partition pruning, row-group min/max filters, and bloom
  * probes.
  *
  * The capability is V2-reader-gated (`aggregatePushdown` +
  * removing parquet from the V1 fallback list), so it runs here on an
  * ISOLATED cloned session (`newSession` shares the catalog but not
  * runtime conf) rather than as a catalog entry — flipping the
  * session-wide V1 list under the sequential Verify/Bench drivers
  * would silently re-plan every other entry's scans.
  */
class FooterAggSpec extends SparkTestBase {

  test("count/min/max are answered from parquet footers (PushedAggregation), results exact") {
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(count(lit(1)), min(col("l_quantity")), max(col("l_quantity")))
      .collect()(0)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    val pushed = s2.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"))
    val p = pushed.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed to the parquet scan:\n$p")
    val r = pushed.collect()(0)
    assert(r.getLong(0) == plain.getLong(0))
    assert(r.get(1) == plain.get(1) && r.get(2) == plain.get(2),
      s"pushed ($r) != plain ($plain)")
  }
}
