package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // (id, group, tokens) — group "a" stream: 300, 300, 300, 200
    (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 200L),
    // group "b": a single doc larger than a bin
    (10L, "b", 1200L),
    // group "c": empty doc then a normal one
    (20L, "c", 0L), (21L, "c", 100L)
  ).toDF("id", "grp", "n_tok")

  test("concatenate-and-chunk semantics: bin = chunk the doc starts in") {
    val packed = Packing.packBins(docs, "id", "n_tok", 512L, "grp")
      .select("id", "bin", "bin_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed(1L) == (0L, 0L))   // starts bin 0 at offset 0
    assert(packed(2L) == (0L, 300L)) // fits: 300+300 > 512 crosses, starts in 0
    assert(packed(3L) == (1L, 88L))  // before=600 -> bin 1, offset 600-512
    assert(packed(4L) == (1L, 388L)) // before=900 -> bin 1
    assert(packed(10L) == (0L, 0L))  // groups pack independently
    assert(packed(20L) == (0L, 0L))
    assert(packed(21L) == (0L, 0L))  // empty doc consumed no budget
  }

  test("bins are full except each group's last (token-conservation)") {
    val packed = Packing.packBins(docs, "id", "n_tok", 512L, "grp")
    val totals = packed.groupBy("grp").agg(
      sum(col("n_tok")).as("toks"), max(col("bin")).as("last_bin")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // group a: 1100 tokens -> starts span bins 0..floor(899/512)=1
    assert(totals("a") == (1100L, 1L))
    assert(totals("b")._2 == 0L) // the oversized doc STARTS in bin 0
  }

  test("null token counts pack as zero-width, not a null bin") {
    val withNull = docs.withColumn("n_tok2",
      when(col("id") === 21L, lit(null).cast("long")).otherwise(col("n_tok")))
    val packed = Packing.packBins(withNull, "id", "n_tok2", 512L, "grp")
      .select("id", "bin", "bin_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed(21L) == (0L, 0L)) // coalesced to 0 — no null poisoning
    assert(packed(20L) == (0L, 0L))
  }

  test("rejects non-positive bin size") {
    assertThrows[IllegalArgumentException](
      Packing.packBins(docs, "id", "n_tok", 0L, "grp"))
  }

  test("window is partitioned (no global-order funnel)") {
    val plan = Packing.packBins(docs, "id", "n_tok", 512L, "grp")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
