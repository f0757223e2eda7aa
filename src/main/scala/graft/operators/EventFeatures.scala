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
}
