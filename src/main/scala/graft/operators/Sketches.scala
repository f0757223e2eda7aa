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

  /** COUNT-MIN sketch over a non-negative integer key column — the
    * frequency sibling of the HLL family (Cormode & Muthukrishnan,
    * "An improved data stream summary: the count-min sketch and its
    * applications", J. Algorithms 2005): `depth` hash rows × `width`
    * cells of exact BIGINT counters, est(k) = min over rows of k's
    * hashed cell. The estimate OVERESTIMATES, never under (every
    * occurrence of k lands in all of k's cells; collisions only add),
    * with the classic ε·N bound at width ≈ e/ε per row. The sketch is
    * LINEAR — cell-wise sums — so increments built independently merge
    * by addition in ANY order or partitioning, the same
    * build-per-increment / merge-at-read shape as
    * [[writeHllSketches]]; unlike HLL the arithmetic is exact
    * integers under the repo's portable double-modular hash family
    * ([[Sampling.hashRank]], one salt per row), so every cell and
    * every estimate re-derives in any SQL engine with no goldens.
    *
    * Scale shape (100 TB): the build is one scan with an in-row
    * `depth`-cell expansion that map-side-combines into ≤ depth×width
    * aggregate rows — the ONLY state, a plan constant (4×512 longs at
    * the entry's defaults) regardless of input volume or key
    * cardinality; a hot key is just a hot counter, never a hot
    * partition. Returns (r, cell, c), r and cell INT.
    */
  def countMinSketch(
      df: DataFrame, keyCol: String,
      width: Int, depth: Int, baseSalt: Long = 21L
  ): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    // a NULL key would hash to NULL cells — an aggregate row no lookup
    // can ever match; drop nulls loudly-by-contract instead of emitting
    // unreachable sketch rows (keys are non-negative ints, see scaladoc)
    df.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until depth).map { r =>
        pmod(Sampling.hashRank(col(keyCol), baseSalt + r), lit(width.toLong))
          .cast("int")
      }: _*)).as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-lookup against a [[countMinSketch]] frame: appends
    * `cms_est` (BIGINT, the min over depth rows) to `keys` (whose
    * columns must not collide with the sketch's internal `r` / `cell`
    * / `c` names). Keys are assumed NON-NEGATIVE integers — the
    * contract the whole portable-hash family shares (a SQL engine's
    * `%` differs from `pmod` on negatives). A probed
    * key whose cell has no sketch row hit an EMPTY cell — that row
    * counts as 0 (left join + coalesce), which keeps the estimate
    * exact-zero for never-seen keys instead of silently
    * overestimating them. The sketch broadcasts (≤ depth×width rows);
    * the probe set stays distributed — the serving shape for "check
    * these candidate heavy keys against last month's sketch" without
    * rescanning anything.
    */
  def countMinLookup(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int, baseSalt: Long = 21L
  ): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val keep = keys.columns.toIndexedSeq
    keys
      .select(keep.map(col) :+ posexplode(array((0 until depth).map { r =>
        pmod(Sampling.hashRank(col(keyCol), baseSalt + r), lit(width.toLong))
          .cast("int")
      }: _*)).as(Seq("r", "cell")): _*)
      .join(broadcast(sketch), Seq("r", "cell"), "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
