package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed order statistics ("what is the TRUE p99?") via
  * iterative histogram narrowing — the selection-algorithm companion
  * to [[HeavyHitters]]' sketch+recount: a sketch answer you can act on
  * is approximate, but audits, SLO thresholds, and billing cuts need
  * the exact order statistic, and a global sort of 100 TB to read 3
  * values is the wrong plan.
  *
  * Algorithm (classic distributed selection): keep a value range
  * [lo, hi] bracketing the target rank plus the count of values below
  * `lo` already excluded. Each pass histograms the in-range values
  * into `B` equi-width buckets (ONE map-side-combined aggregate whose
  * output is ≤ B rows — the only thing the driver ever sees), picks
  * the bucket containing the residual rank, and tightens [lo, hi] to
  * that bucket's observed [min, max] — so a point-mass bucket resolves
  * immediately (min == max) and the range strictly shrinks otherwise.
  * When ≤ `collectThreshold` values remain in range, they are
  * collected and the answer read off directly. Convergence: each pass
  * cuts the candidate set to one bucket; for n values the loop is
  * O(log_B n) passes in practice and `maxPasses` guards pathological
  * floating-point distributions loudly rather than spinning.
  *
  * Every driver-side materialization is bounded by construction:
  * B-row histograms and one ≤ collectThreshold final bucket — never a
  * data-proportional collect.
  */
object Quantiles {

  /** Exact type-1 (discrete) quantiles of `valueCol`: for each q the
    * value whose 1-based ascending rank is `max(1, ceil(q·n))` over
    * the non-null values. Output: `q` (double), `rank` (long),
    * `value` (double) — one row per requested quantile, exact, so the
    * frame is hash-comparable against any engine's ORDER BY + OFFSET.
    * All requested ranks narrow SIMULTANEOUSLY (broadcast bracket
    * table, one aggregate per pass) — asking for 9 decile boundaries
    * costs the same 2-3 column scans as asking for one.
    */
  def exactQuantiles(
      df: DataFrame, valueCol: String, qs: Seq[Double],
      buckets: Int = 512, collectThreshold: Int = 8192, maxPasses: Int = 64
  ): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    require(buckets >= 2 && collectThreshold >= 1 && maxPasses >= 1,
      "degenerate narrowing parameters")
    val spark = df.sparkSession
    val v = col(valueCol).cast(DoubleType)
    val vals = df.select(v.as("v")).filter(col("v").isNotNull && !isnan(col("v")))
    val outSchema = StructType(Seq(
      StructField("q", DoubleType, nullable = false),
      StructField("rank", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
      max(col("v")).as("mx")).head()
    val n = head.getLong(0)
    if (n == 0L) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    }

    // ALL ranks narrow simultaneously: each pass is ONE aggregate over
    // the column, with every rank's current bracket shipped as a
    // broadcast |ranks|-row table (BroadcastNestedLoopJoin — a row is
    // tested against ≤ |qs| brackets and duplicated only where
    // brackets overlap). p50/p90/p99 or 9 decile boundaries therefore
    // cost the SAME 2-3 corpus scans as one rank — the difference
    // between 3 and 18 full-column passes at 100 TB.
    final case class Bracket(rank: Long, var lo: Double, var hi: Double,
      var below: Long)
    val ranks = qs.zipWithIndex.map { case (q, i) =>
      i -> math.max(1L, math.ceil(q * n).toLong)
    }.toMap
    val brackets = scala.collection.mutable.Map[Int, Bracket]()
    val resolved = scala.collection.mutable.Map[Int, Double]()
    val mn = head.getDouble(1); val mx = head.getDouble(2)
    ranks.foreach { case (i, r) =>
      if (mn == mx) resolved(i) = mn else brackets(i) = Bracket(r, mn, mx, 0L)
    }
    val finals = scala.collection.mutable.Map[Int, (Double, Double, Long)]()
    import spark.implicits._
    var pass = 0
    while (brackets.nonEmpty && pass < maxPasses) {
      pass += 1
      val btab = broadcast(brackets.toSeq
        .map { case (i, b) => (i, b.lo, b.hi) }.toDF("rid", "__lo", "__hi"))
      val width = (col("__hi") - col("__lo")) / buckets
      // clamp the top edge into the last bucket (floating point can
      // land exactly on B)
      val idx = least(lit(buckets - 1),
        floor((col("v") - col("__lo")) / width).cast(IntegerType))
      val hist = vals
        .join(btab, col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("rid"), idx.as("b"))
        .agg(count(lit(1)).as("c"), min(col("v")).as("bmin"),
          max(col("v")).as("bmax"))
        .collect() // ≤ active·buckets rows — bounded by construction
        .groupBy(_.getInt(0))
      hist.foreach { case (rid, rows) =>
        val b = brackets(rid)
        val sorted = rows.sortBy(_.getInt(1))
        val residual = b.rank - b.below
        var acc = 0L; var i = 0; var chosen: Row = null
        while (chosen == null && i < sorted.length) {
          val c = sorted(i).getLong(2)
          if (acc + c >= residual) chosen = sorted(i) else { acc += c; i += 1 }
        }
        require(chosen != null,
          s"rank ${b.rank} fell outside its bracket [${b.lo}, ${b.hi}] — " +
            "input changed between passes?")
        val bmin = chosen.getDouble(3); val bmax = chosen.getDouble(4)
        val bcount = chosen.getLong(2)
        if (bmin == bmax) { resolved(rid) = bmin; brackets.remove(rid) }
        else if (bcount <= collectThreshold) {
          finals(rid) = (bmin, bmax, residual - acc); brackets.remove(rid)
        } else { b.below += acc; b.lo = bmin; b.hi = bmax }
      }
      require(brackets.keys.forall(hist.contains),
        "bracket lost its rows mid-narrowing")
    }
    require(brackets.isEmpty,
      s"quantile narrowing did not converge in $maxPasses passes")

    if (finals.nonEmpty) {
      // batched endgame: ONE gather pass for every unresolved rank's
      // final bucket (≤ collectThreshold values each)
      val ftab = broadcast(finals.toSeq
        .map { case (i, (lo, hi, _)) => (i, lo, hi) }.toDF("rid", "__lo", "__hi"))
      val gathered = vals
        .join(ftab, col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("rid"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .collect()
      gathered.foreach { r =>
        val rid = r.getInt(0)
        val vs = r.getSeq[Double](1)
        resolved(rid) = vs((finals(rid)._3 - 1).toInt)
      }
      require(resolved.size == ranks.size,
        "a finalized rank gathered no rows — float-edge filter bug")
    }

    val rows = qs.zipWithIndex.map { case (q, i) =>
      Row(q, ranks(i), resolved(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), outSchema)
  }

  /** Exact per-group type-1 quantile — single-`q` convenience form of
    * [[groupedExactQuantiles]]; see there for the algorithm, bounds,
    * and output contract.
    */
  def groupedExactQuantile(
      df: DataFrame, keyCol: String, valueCol: String, q: Double,
      buckets: Int = 128, collectThreshold: Int = 4096,
      maxGroups: Int = 4096, maxPasses: Int = 64
  ): DataFrame =
    groupedExactQuantiles(df, keyCol, valueCol, Seq(q), buckets,
      collectThreshold, maxGroups, maxPasses)

  /** Exact per-group type-1 quantiles — "the true median latency PER
    * endpoint" — with ALL groups AND all requested `qs` narrowed
    * simultaneously: each pass is ONE aggregate over the corpus (rows
    * joined to their group's current brackets via a broadcast
    * |active (group, q) pairs|-row table), so the pass count stays
    * O(log_B max-group-size) regardless of how many groups or
    * quantiles there are, instead of |groups|·|qs| independent
    * selection loops (the [[exactQuantiles]] simultaneity, per group —
    * asking every group for terciles costs the same 2-3 column scans
    * as asking for its median). Output: keyCol, `q`, `rank`, `value` —
    * one row per (group, q).
    *
    * Driver state is the bracket table: ≤ `maxGroups`·|qs| entries
    * (group count enforced loudly up front), each pass collecting
    * ≤ active·B histogram rows and the endgame collecting
    * ≤ `collectThreshold` values per unresolved (group, q) (gathered
    * in ONE batched pass via the same broadcast-bracket join + a
    * per-bracket sorted gather, never a per-group driver loop).
    * Brackets whose chosen bucket is a point mass resolve without
    * collecting anything. For group cardinalities beyond `maxGroups`,
    * this is the wrong tool — use the windowed rank form and accept
    * the per-group sort shuffle. Group keys are compared and emitted
    * as strings (the driver's bracket table is key-typed-erased);
    * numeric keys round-trip losslessly.
    */
  def groupedExactQuantiles(
      df: DataFrame, keyCol: String, valueCol: String, qs: Seq[Double],
      buckets: Int = 128, collectThreshold: Int = 4096,
      maxGroups: Int = 4096, maxPasses: Int = 64
  ): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    require(buckets >= 2 && collectThreshold >= 1 && maxPasses >= 1,
      "degenerate narrowing parameters")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .select(col(keyCol).cast(StringType).as("k"),
        col(valueCol).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val heads = vals.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .limit(maxGroups + 1).collect()
    require(heads.length <= maxGroups,
      s"more than $maxGroups groups — use a windowed rank instead")

    // mutable bracket per unresolved (group, q-index)
    final case class Bracket(rank: Long, var lo: Double, var hi: Double,
      var below: Long)
    val ranks = (for (r <- heads; qi <- qs.indices) yield
      (r.getString(0), qi) ->
        math.max(1L, math.ceil(qs(qi) * r.getLong(1)).toLong)).toMap
    val brackets = scala.collection.mutable.Map[(String, Int), Bracket]()
    val resolved = scala.collection.mutable.Map[(String, Int), (Long, Double)]()
    heads.foreach { r =>
      val k = r.getString(0)
      qs.indices.foreach { qi =>
        if (r.getDouble(2) == r.getDouble(3))
          resolved((k, qi)) = (ranks((k, qi)), r.getDouble(2))
        else brackets((k, qi)) =
          Bracket(ranks((k, qi)), r.getDouble(2), r.getDouble(3), 0L)
      }
    }
    // ((key, qi) -> (lo, hi, position within the gathered bucket))
    val finals = scala.collection.mutable.Map[(String, Int), (Double, Double, Long)]()

    var pass = 0
    while (brackets.nonEmpty && pass < maxPasses) {
      pass += 1
      // rows join their group's brackets on the key and are range-
      // filtered per bracket — a row lands in one histogram per
      // OVERLAPPING bracket of its group (≤ |qs|), so multi-q costs
      // duplicated histogram input only where brackets still overlap
      val btab = broadcast(brackets.toSeq
        .map { case ((k, qi), b) => (k, qi, b.lo, b.hi) }
        .toDF("k", "rid", "__lo", "__hi"))
      val width = (col("__hi") - col("__lo")) / buckets
      val idx = least(lit(buckets - 1),
        floor((col("v") - col("__lo")) / width).cast(IntegerType))
      val hist = vals.join(btab, "k")
        .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("k"), col("rid"), idx.as("b"))
        .agg(count(lit(1)).as("c"), min(col("v")).as("bmin"),
          max(col("v")).as("bmax"))
        .collect() // ≤ active·buckets rows
        .groupBy(r => (r.getString(0), r.getInt(1)))
      hist.foreach { case (key, rows) =>
        val b = brackets(key)
        val sorted = rows.sortBy(_.getInt(2))
        var acc = 0L; var i = 0; var chosen: Row = null
        val residual = b.rank - b.below
        while (chosen == null && i < sorted.length) {
          val c = sorted(i).getLong(3)
          if (acc + c >= residual) chosen = sorted(i) else { acc += c; i += 1 }
        }
        require(chosen != null, s"group $key: rank fell outside its bracket")
        val bmin = chosen.getDouble(4); val bmax = chosen.getDouble(5)
        val bcount = chosen.getLong(3)
        if (bmin == bmax) { resolved(key) = (b.rank, bmin); brackets.remove(key) }
        else if (bcount <= collectThreshold) {
          finals(key) = (bmin, bmax, residual - acc); brackets.remove(key)
        } else { b.below += acc; b.lo = bmin; b.hi = bmax }
      }
      // a bracket still open but absent from the histogram has lost
      // its rows (float-edge filter bug) and would loop forever
      require(brackets.keys.forall(hist.contains),
        "bracket lost its rows mid-narrowing")
    }
    require(brackets.isEmpty,
      s"grouped narrowing did not converge in $maxPasses passes for " +
        s"${brackets.keys.take(5).mkString(",")}")

    if (finals.nonEmpty) {
      // one batched endgame: gather each unresolved bracket's final
      // bucket (≤ collectThreshold values each), pick the residual rank
      val ftab = broadcast(finals.toSeq
        .map { case ((k, qi), (lo, hi, _)) => (k, qi, lo, hi) }
        .toDF("k", "rid", "__lo", "__hi"))
      val gathered = vals.join(ftab, "k")
        .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("k"), col("rid"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .collect()
      gathered.foreach { r =>
        val key = (r.getString(0), r.getInt(1))
        val vs = r.getSeq[Double](2)
        val (_, _, pos) = finals(key)
        resolved(key) = (ranks(key), vs((pos - 1).toInt))
      }
      require(resolved.size == heads.length.toLong * qs.size,
        "a finalized bracket gathered no rows — float-edge filter bug")
    }

    resolved.toSeq.map { case ((k, qi), (rank, v)) => (k, qs(qi), rank, v) }
      .toDF(keyCol, "q", "rank", "value")
  }

  /** Winsorized value column — robust-statistics clipping: values
    * below the exact `pLo` quantile are raised to it, values above the
    * exact `pHi` quantile lowered to it, so downstream means/sums stop
    * being hostage to a handful of outliers (sensor glitches, test
    * spam) without DROPPING rows the way a filter-trim would. The
    * boundaries are true order statistics from [[exactQuantiles]]
    * (bounded selection passes), the clip itself a shuffle-free
    * codegen'd `least(greatest(v, lo), hi)` projection. Null/NaN
    * values pass through unclipped (they carry their own meaning).
    */
  def winsorize(
      df: DataFrame, valueCol: String, pLo: Double = 0.01, pHi: Double = 0.99,
      outCol: String = "winsorized"
  ): DataFrame = {
    require(pLo > 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains(outCol),
      s"input already has a column named '$outCol'")
    val bounds = exactQuantiles(df, valueCol, Seq(pLo, pHi))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    if (bounds.isEmpty) { // empty input
      return df.withColumn(outCol, lit(null).cast(DoubleType))
    }
    val v = col(valueCol).cast(DoubleType)
    df.withColumn(outCol,
      when(v.isNull || isnan(v), v)
        .otherwise(least(greatest(v, lit(bounds(pLo))), lit(bounds(pHi)))))
  }

  /** Robust outlier screen — the median/MAD counterpart of the
    * pipeline's mean/σ z-score rule (A5): a value is an outlier when
    * `|v − median| > k · 1.4826 · MAD`, with MAD the exact median of
    * absolute deviations. Because median and MAD have a 50% breakdown
    * point, a heavy-tailed column cannot inflate its own threshold the
    * way outliers inflate σ — the standard robust-statistics fix, and
    * 1.4826 the usual consistency constant making k comparable to
    * z-score sigmas under normality. Returns the FLAGGED rows.
    *
    * Both medians come from [[exactQuantiles]]' bounded narrowing
    * (2-3 column scans each); the flag itself is a shuffle-free
    * codegen'd comparison against driver-computed constants, so the
    * operator is 4-6 scans total and never sorts. Null/NaN values are
    * never flagged.
    */
  def madOutliers(
      df: DataFrame, valueCol: String, k: Double = 3.0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = col(valueCol).cast(DoubleType)
    val medRows = exactQuantiles(df, valueCol, Seq(0.5)).collect()
    if (medRows.isEmpty) return df.filter(lit(false))
    val med = medRows(0).getDouble(2)
    val dev = df.select(abs(v - lit(med)).as("__dev"))
    val mad = exactQuantiles(dev, "__dev", Seq(0.5)).collect()(0).getDouble(2)
    val thr = k * 1.4826 * mad
    df.filter(!v.isNull && !isnan(v) && abs(v - lit(med)) > lit(thr))
  }

  /** Equal-frequency (quantile) binning — the feature-engineering
    * discretizer ("which spend decile is this user in?"): rows are
    * labeled `1..nBuckets` by comparison against the `nBuckets − 1`
    * EXACT quantile boundaries from [[exactQuantiles]], with ties
    * going DOWN (a value equal to a boundary stays in the lower
    * bucket, so bucket k is exactly the half-open value interval
    * (b_{k−1}, b_k]). Null and NaN values label null.
    *
    * The boundaries are a driver-side array of `nBuckets − 1` doubles
    * broadcast into a codegen'd `filter`+`size` projection — after the
    * selection passes, labeling is shuffle-free and whole-stage. With
    * heavy ties the REALIZED bucket populations are deliberately
    * unequal (all copies of a boundary value share a bucket) — that is
    * the correct equal-frequency-with-ties semantics, not a defect.
    */
  def withQuantileBuckets(
      df: DataFrame, valueCol: String, nBuckets: Int, outCol: String = "bucket"
  ): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(!df.columns.contains(outCol),
      s"input already has a column named '$outCol'")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bs = exactQuantiles(df, valueCol, qs)
      .collect().map(_.getDouble(2)).sorted // nBuckets - 1 doubles
    val v = col(valueCol).cast(DoubleType)
    if (bs.isEmpty) { // empty input: no boundaries — every value is null
      return df.withColumn(outCol, lit(null).cast(LongType))
    }
    val arr = array(bs.toIndexedSeq.map(lit(_)): _*)
    df.withColumn(outCol,
      when(v.isNull || isnan(v), lit(null).cast(LongType))
        .otherwise(lit(1L) + size(filter(arr, b => v > b)).cast(LongType)))
  }
}
