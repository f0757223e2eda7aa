package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling per-key activity features over an event stream — the
  * feature-engineering step that turns raw events into per-entity
  * daily signals (activity trend, engagement windows) for downstream
  * sampling or labeling. Kept deliberately window-based: the rolling
  * aggregate is a RANGE frame over day ordinals, so gap days are
  * handled by value (a 7-day window spans calendar days, not 7
  * preceding rows — the classic rows-vs-range bug).
  */
object EventFeatures {

  /** Per (key, day) event counts plus a trailing `windowDays`-day
    * rolling sum. Output: keyCol, `day` (yyyy-MM-dd string — the
    * engine-portable date form every catalog entry uses), `n_events`,
    * `n_events_roll`.
    *
    * Plan shape: one map-side-combined groupBy on (key, day) collapses
    * the stream to |keys × active days| rows, and the RANGE window is
    * partitioned BY KEY over that collapsed frame — state bounded by
    * one key's active days, never an unpartitioned window. At 100 TB
    * the groupBy is the only corpus-scale shuffle; the window input is
    * structurally tiny (≤ keys × days).
    */
  def rollingDailyCounts(
      df: DataFrame, tsCol: String, keyCol: String, windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val dayNum = datediff(to_date(col(tsCol)), lit("1970-01-01"))
    val daily = df
      .groupBy(col(keyCol), dayNum.as("__day_num"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day_num"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("n_events_roll", sum(col("n_events")).over(w))
      .select(col(keyCol),
        date_format(date_add(lit("1970-01-01"), col("__day_num")), "yyyy-MM-dd")
          .as("day"),
        col("n_events"), col("n_events_roll"))
  }

  /** Per-key daily burst detection: flags each (key, day) whose event
    * count exceeds that key's own mean + `z`·stddev over its active
    * days — the per-entity anomaly screen (bot spikes, telemetry
    * bursts) that a global threshold can't express because baselines
    * differ per key. Output: keyCol, `day` (yyyy-MM-dd), `n_events`,
    * `is_anomaly` (0/1). Population stddev over ACTIVE days only;
    * keys with one active day (or a constant rate) have zero variance
    * and never flag (strict >).
    *
    * Exactness: the two-pass moments are integer sums; mean and
    * E[X²] are single IEEE divisions, variance is clamped at zero
    * (`greatest`) against rounding, and IEEE `sqrt` is correctly
    * rounded — every comparison input is bit-identical cross-engine,
    * so the 0/1 flags hash-match. The squared day count bounds the
    * integer path: safe while a key's busiest day stays under ~3·10⁹
    * events (long overflow on n²).
    *
    * Plan shape: the same map-side-combined (key, day) collapse as
    * [[rollingDailyCounts]]; per-key moments are a second, |keys|-row
    * agg on the collapsed frame, joined back key-to-key — the raw
    * event stream shuffles once, everything after is bounded by
    * |keys × active days|.
    */
  def dailyAnomalies(
      df: DataFrame, tsCol: String, keyCol: String, z: Double = 2.0
  ): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val dayNum = datediff(to_date(col(tsCol)), lit("1970-01-01"))
    val daily = df
      .groupBy(col(keyCol), dayNum.as("__day_num"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_days"),
      sum(col("n_events")).as("s1"),
      sum(col("n_events") * col("n_events")).as("s2"))
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val mean = col("s1").cast(DoubleType) / col("n_days").cast(DoubleType)
    val meanSq = col("s2").cast(DoubleType) / col("n_days").cast(DoubleType)
    val threshold = mean + lit(z) * sqrt(greatest(lit(0.0), meanSq - mean * mean))
    daily.join(stats, keyCol)
      .select(col(keyCol),
        date_format(date_add(lit("1970-01-01"), col("__day_num")), "yyyy-MM-dd")
          .as("day"),
        col("n_events"),
        (col("n_events").cast(DoubleType) > threshold).cast(IntegerType)
          .as("is_anomaly"))
  }
}
