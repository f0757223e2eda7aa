package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  test("rollingDailyCounts: RANGE over calendar days, gaps excluded") {
    val ev = Seq(
      (1L, ts(0, 1)), (1L, ts(0, 5)), // day 0: 2 events
      (1L, ts(1, 3)),                 // day 1: 1 event
      (1L, ts(10, 2)),                // day 10: outside any 7-day window
      (2L, ts(0, 4))                  // second user independent
    ).toDF("user_id", "t")
    val out = EventFeatures.rollingDailyCounts(ev, "t", "user_id", windowDays = 7)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out((1L, "2024-01-01")) == ((2L, 2L)))
    // day 1 window covers day 0: rolling = 3, daily = 1
    assert(out((1L, "2024-01-02")) == ((1L, 3L)))
    // a ROWS frame would have summed the 2 preceding rows here (4);
    // the RANGE frame must exclude the 9-day-old activity
    assert(out((1L, "2024-01-11")) == ((1L, 1L)))
    assert(out((2L, "2024-01-01")) == ((1L, 1L)))
  }

  test("rollingDailyCounts: window is partitioned by key (scale guard)") {
    val ev = Seq((1L, ts(0, 1))).toDF("user_id", "t")
    val plan = EventFeatures.rollingDailyCounts(ev, "t", "user_id", 7)
      .queryExecution.executedPlan.toString
    // an unpartitioned window would show "Window [... ORDER BY ...]"
    // with an Exchange SinglePartition feeding it
    assert(!plan.contains("SinglePartition"),
      s"rolling window must not serialize through one task:\n$plan")
  }

  test("rollingDailyCounts rejects nonpositive windows") {
    val ev = Seq((1L, ts(0, 1))).toDF("user_id", "t")
    assertThrows[IllegalArgumentException](
      EventFeatures.rollingDailyCounts(ev, "t", "user_id", 0))
  }
}
