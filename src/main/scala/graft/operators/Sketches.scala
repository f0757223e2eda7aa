package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable cardinality sketches — incremental distinct counting
  * for a growing corpus: sketch each ingest increment ONCE, store the
  * sketch bytes (KBs per key), and answer "distinct tokens per
  * language so far" by unioning sketches — never by rescanning 100 TB
  * of history. The cardinality sibling of the persisted artifacts the
  * engine already maintains (MinHash index, bloom filters): Datasketches
  * HLL via Spark's built-in `hll_sketch_agg` / `hll_union_agg`, so the
  * estimate is mergeable, and — because HLL union is a register-wise
  * max — ORDER-INVARIANT: the same increments give the same estimate
  * whatever the merge order or partitioning, which is what makes the
  * catalog entry deterministic enough to verify.
  *
  * Error: ~1.04/sqrt(2^lgConfigK) relative standard error — ~1.6% at
  * the default lgConfigK=12, a few KB per sketch. Exactness is NOT the
  * contract; the catalog entry pins the estimate inside a 5% envelope
  * against the exact count.
  */
object Sketches {

  /** Write one HLL sketch per `keyCols` group over `valueCol` to
    * `path` (parquet: key columns + binary `hll`). One map-side
    * combined aggregate — sketch buffers are constant-size, so a hot
    * key costs nothing extra.
    */
  def writeHllSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      mode: String = "error",
      lgConfigK: Int = 12
  ): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("hll"))
      .write.mode(mode).parquet(path)
  }

  /** Union sketch increments (written by [[writeHllSketches]] with the
    * same keys + lgConfigK) into per-key distinct estimates:
    * key columns + `n_distinct_est`. Reads ONLY sketch bytes — cost is
    * proportional to increments × keys, never the data that was
    * sketched.
    */
  def unionHllEstimates(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "need at least one sketch increment")
    val all = paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
    val keyCols = all.columns.filterNot(_ == "hll").toIndexedSeq
    all.groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("__u"))
      .select(keyCols.map(col) :+
        hll_sketch_estimate(col("__u")).as("n_distinct_est"): _*)
  }
}
