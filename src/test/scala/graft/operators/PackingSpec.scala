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

  test("lengthBatches assigns batches by global (len, id) order without a global window") {
    val df = spark.range(1000)
      .select(col("id"), ((col("id") * 7919) % 350).as("len"))
      .repartition(8)
    val got = Packing.lengthBatches(df, "id", "len", batchSize = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // oracle: rank in (len, id) order, integer-divided by batch size
    val expect = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, len) => (len, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i / 32).toLong }.toMap
    assert(got == expect)
  }

  test("lengthBatches cuts aggregate padding versus arrival-order batching") {
    val df = spark.range(2048)
      .select(col("id"), ((col("id") * 131) % 1000).as("len"))
    val b = Packing.lengthBatches(df, "id", "len", batchSize = 64)
    val stats = Packing.batchPaddingStats(b, "len").collect()
    assert(stats.length == 2048 / 64)
    def aggregateWaste(rows: Array[org.apache.spark.sql.Row]): Double = {
      val padded = rows.map(r => r.getAs[Long]("max_len") * r.getAs[Long]("n_seqs")).sum
      (padded - rows.map(_.getAs[Long]("sum_len")).sum).toDouble / padded
    }
    // arrival-order batches mix the whole length range, wasting ~half
    // of every dense batch on padding (uniform lengths)
    val arrival = Packing.batchPaddingStats(
      df.withColumn("batch_id", expr("id div 64")), "len").collect()
    val sortedWaste = aggregateWaste(stats)
    val arrivalWaste = aggregateWaste(arrival)
    assert(sortedWaste < arrivalWaste / 4,
      s"sorted $sortedWaste vs arrival $arrivalWaste")
  }

  test("lengthBatches handles null lengths (sorted first, padded as zero)") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("id", "len")
    val got = Packing.lengthBatches(df, "id", "len", batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // nulls (ids 2,4) sort before any length -> batch 0
    assert(got(2L) == 0L && got(4L) == 0L)
    assert(got(3L) == 1L && got(1L) == 1L)
  }
}
