package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two samples of one table —
  * the monitoring step a 100 TB ingest pipeline runs per refresh
  * ("did this crawl's quality/value distribution move vs the last
  * one?") before the new slice is admitted to the training mix. The
  * reference has no analogue (its validation is per-row rules); this
  * is the standard two-sample Kolmogorov–Smirnov test statistic
  * (max ECDF gap), kept EXACT and integer-valued so the result is
  * hash-stable across engines.
  */
object Drift {

  /** Per-group two-sample KS statistic, exact. `sampleCol` must be an
    * integer 0/1 tag (sample A / sample B); null and NaN values are
    * excluded (a missing measurement is not a position on the ECDF).
    *
    * Output per group: `n_a`, `n_b` (sample sizes) and `ks_num`, the
    * INTEGER numerator of the KS distance — D = ks_num / (n_a·n_b),
    * since at every distinct value v the scaled ECDF gap
    * |n_b·cntA(≤v) − n_a·cntB(≤v)| is a whole number. Reporting the
    * numerator avoids float division entirely: callers compare
    * ks_num against c(α)·sqrt(n_a·n_b·(n_a+n_b)) driver-side.
    *
    * Scale shape: one hash-shuffle to (group, value) counts — the
    * corpus collapses to its distinct values per group BEFORE any
    * window — then a group-PARTITIONED cumulative-sum window over
    * those distinct values (never an unpartitioned window), and an
    * algebraic max. The per-group window cost is the group's
    * DISTINCT-VALUE cardinality: for measured/quantized columns
    * (prices, counts, scores) that is ≪ rows; for a continuous
    * full-precision column it approaches the row count, and the exact
    * ECDF inherently needs those values ordered — at that extreme use
    * [[ksStatisticOnGrid]] (KS on a fixed dyadic grid bounds the true
    * D within one grid cell and bounds the window input by a domain
    * constant) rather than accepting the per-group sort.
    * Counts are longs; products stay within long for any
    * n_a·cnt ≤ 9.2e18 — i.e. samples up to ~3e9 rows per group.
    */
  def ksStatistic(
      df: DataFrame, groupCol: String, valueCol: String, sampleCol: String
  ): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(col(groupCol), col(valueCol))
      .agg(
        sum(when(col(sampleCol) === 0, 1L).otherwise(0L)).as("__c0"),
        sum(when(col(sampleCol) === 1, 1L).otherwise(0L)).as("__c1"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("__f0", sum(col("__c0")).over(w))
      .withColumn("__f1", sum(col("__c1")).over(w))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("__c0")).as("n_a"), sum(col("__c1")).as("n_b"))
    cum.join(totals, groupCol)
      .groupBy(col(groupCol), col("n_a"), col("n_b"))
      .agg(max(abs(col("__f0") * col("n_b") - col("__f1") * col("n_a")))
        .as("ks_num"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("ks_num"))
  }

  /** [[ksStatistic]] over a FIXED dyadic grid — the production shape
    * for continuous full-precision value columns, where the exact
    * ECDF's per-group window input would otherwise approach the
    * group's row count (the scale hazard [[ksStatistic]]'s scaladoc
    * warns about). Each value is quantized to
    * `floor(value · cellsPerUnit)` before the ECDF, so the window's
    * per-group input is bounded by `range(value) · cellsPerUnit`
    * CELLS — a domain constant, independent of corpus size (the
    * events table's [0, 561) domain at 16 cells/unit is ≤ 8 976 cells
    * per group at ANY scale). KS on the grid bounds the true D within
    * one cell's probability mass, the standard binned-KS trade.
    *
    * `cellsPerUnit` must be a power of two: the scaling multiply is
    * then exact in IEEE doubles (dyadic), so the cell assignment —
    * and therefore the whole statistic — is bit-identical across
    * engines. `floor` on a double column yields LongType, so
    * downstream arithmetic is pure integer. Null/NaN values are
    * excluded BEFORE quantizing (Spark's `floor` would fold NaN into
    * cell 0 after the long cast).
    *
    * Columns with an inherently bounded distinct-value domain
    * (integer lengths, 2-decimal prices) don't need this — the exact
    * [[ksStatistic]] is already grid-bounded there (`x_chars_drift`).
    */
  def ksStatisticOnGrid(
      df: DataFrame, groupCol: String, valueCol: String, sampleCol: String,
      cellsPerUnit: Int = 16
  ): DataFrame = {
    require(cellsPerUnit > 0 && Integer.bitCount(cellsPerUnit) == 1,
      s"cellsPerUnit must be a positive power of two, got $cellsPerUnit")
    val clean = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
    val cells = clean.withColumn("__cell",
      floor(col(valueCol) * lit(cellsPerUnit.toDouble)))
    ksStatistic(cells, groupCol, "__cell", sampleCol)
  }

  /** Binned drift counts — the 100 TB-scale drift path. Where
    * [[ksStatistic]]'s window walks every distinct value, this bins
    * each row against the EXACT corpus deciles (from
    * [[Quantiles.exactQuantiles]]' histogram-narrowing selector — a
    * bounded-driver-state computation, never a sort) and emits per
    * (group, bin) sample counts: the contingency table PSI / chi² /
    * G-tests read. Bin k = number of decile edges STRICTLY below the
    * value (0..9); duplicate edges (tied deciles) are counted per
    * rank, exactly as the 9-row edge list contains them.
    *
    * Scale shape: the 9 edge values are collected (bounded by
    * construction, like the session-stats p50) and compiled into ONE
    * codegen'd comparison chain — no join, no explode, no window; the
    * only shuffle is the final (group, bin) count. Output integers
    * only: `bin`, `n_a`, `n_b` per group.
    */
  def binnedDriftCounts(
      df: DataFrame, groupCol: String, valueCol: String, sampleCol: String
  ): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
    val edges = Quantiles.exactQuantiles(
        vals, valueCol, (1 to 9).map(_ / 10.0))
      .collect().map(_.getDouble(2))
    val bin = edges
      .map(e => when(col(valueCol) > lit(e), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    vals
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(
        sum(when(col(sampleCol) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(sampleCol) === 1, 1L).otherwise(0L)).as("n_b"))
  }
}
