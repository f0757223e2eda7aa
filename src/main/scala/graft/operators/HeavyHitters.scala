package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact frequent-items ("heavy hitters") over an arbitrarily large item
  * stream — the corpus-analytics primitive behind boilerplate detection
  * (hot n-grams), hot-key diagnosis (which join key is viral), and
  * vocabulary floors (every token above a share threshold).
  *
  * The naive plan — `groupBy(item).count` then filter — shuffles one row
  * per DISTINCT item. At 100 TB the distinct-token universe is billions
  * of rows, so that shuffle (and the hash-aggregate maps feeding it) is
  * the bottleneck even though the answer is a handful of items. This
  * operator instead runs the classic two-phase exact scheme built on a
  * mergeable Misra-Gries summary (Misra & Gries 1982; merged-summary
  * guarantee per Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *  1. CANDIDATES + TOTAL — one `mapPartitions` pass keeps a
  *     Misra-Gries sketch of `sketchSize` counters per partition
  *     (constant memory, no spill) and emits the surviving keys plus
  *     ONE per-partition row-count row: at most `sketchSize + 1` rows
  *     per partition leave the scan, independent of data volume, and
  *     the exact stream total N rides along for free (no separate
  *     count() scan). Any item with global share >= minShare has share
  *     >= minShare in at least one partition (pigeonhole), and an MG
  *     sketch with m >= ceil(1/minShare) counters retains every item
  *     whose in-partition share exceeds 1/(m+1) — so the union of
  *     per-partition survivors is a SUPERSET of the true heavy hitters
  *     (never a miss; possibly false candidates, which phase 2
  *     removes). The phase-1 output is collected — a BOUNDED driver
  *     payload ((sketchSize+1) × partitions rows, like Ivf's centroid
  *     collect) — so nothing is scanned twice to read it.
  *  2. EXACT RECOUNT — the second (and last) scan counts ONLY the
  *     candidate set via a broadcast left-semi join (map-side filter,
  *     no shuffle of the stream; the post-filter groupBy shuffles at
  *     most |candidates| partials per partition) and keeps items with
  *     count >= ceil(minShare * N). Output counts are exact, so the
  *     result is deterministic and oracle-checkable regardless of how
  *     the sketch sliced the stream.
  *
  * Exactly two scans of the input (callers with an expensive upstream
  * should persist it); per-executor memory is O(sketchSize); the
  * candidate set is <= sketchSize * numPartitions keys — with the
  * default m = 2/minShare that stays in the tens of MB even at
  * thousands of partitions for realistic thresholds (minShare >= 1e-4).
  */
object HeavyHitters {

  /** Items of `itemCol` (cast to string, nulls dropped) whose frequency
    * share is at least `minShare`, with their EXACT counts. Columns:
    * `item` (string), `cnt` (long).
    *
    * `sketchSize` defaults to ceil(2/minShare) — twice the guarantee
    * minimum, halving phase-1 false candidates at negligible memory.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      minShare: Double,
      sketchSize: Int = 0
  ): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    val m =
      if (sketchSize > 0) sketchSize
      else math.max(16, math.ceil(2.0 / minShare).toInt)
    require(m >= math.ceil(1.0 / minShare).toInt,
      s"sketchSize $m below ceil(1/minShare) — phase 1 could miss a true heavy hitter")

    val items = df
      .select(col(itemCol).cast(StringType).as("item"))
      .filter(col("item").isNotNull)

    // phase 1: MG candidates + the per-partition row count in ONE scan;
    // output is bounded by (m+1) × partitions rows, collected like
    // Ivf's centroid table
    val phase1Schema = StructType(Seq(
      StructField("item", StringType, nullable = true),
      StructField("n", LongType, nullable = false)))
    val phase1 = items.mapPartitions { rows =>
      val counters = new java.util.HashMap[String, Long](m * 2)
      var n = 0L
      rows.foreach { r =>
        n += 1L
        val s = r.getString(0)
        val cur = counters.getOrDefault(s, 0L) // counters are always >= 1
        if (cur > 0L) counters.put(s, cur + 1L)
        else if (counters.size < m) counters.put(s, 1L)
        else {
          // decrement-all: amortized O(1) per input — each decrement
          // round consumes m prior increments
          val it = counters.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      counters.keySet().iterator().asScala.map(Row(_, 0L)) ++
        Iterator.single(Row(null, n))
    }(Encoders.row(phase1Schema)).collect()

    val total = phase1.iterator.map(_.getLong(1)).sum
    val spark = df.sparkSession
    if (total == 0L) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("item", StringType, nullable = false),
          StructField("cnt", LongType, nullable = false))))
    }
    val threshold = math.ceil(minShare * total).toLong
    val candidates = spark.createDataset(
      phase1.iterator.filterNot(_.isNullAt(0)).map(_.getString(0))
        .toSeq.distinct)(Encoders.STRING).toDF("item")

    items
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
