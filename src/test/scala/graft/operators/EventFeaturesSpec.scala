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

  test("dailyAnomalies: per-key baseline flags bursts; constant keys never flag") {
    // user 1: counts 1,1,1,1,10 over 5 days -> mean 2.8, pop std 3.6;
    //   threshold 10.0 -> strict > means even the burst day is NOT
    //   flagged at z=2 exactly... use z=1.5: thr = 2.8+1.5*3.6 = 8.2,
    //   so only the 10-count day flags.
    val burst =
      (0 until 4).map(d => (1L, ts(d, 1))) ++         // 1 event/day, days 0-3
      (0 until 10).map(h => (1L, ts(4, h + 1))) ++    // 10 events on day 4
      (0 until 3).map(d => (2L, ts(d, 2)))            // user 2: constant 1/day
    val out = EventFeatures.dailyAnomalies(
        burst.toDF("user_id", "t"), "t", "user_id", z = 1.5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    assert(out((1L, "2024-01-05")) == ((10L, 1)), "burst day flags")
    for (d <- 1 to 4)
      assert(out((1L, f"2024-01-0$d")) == ((1L, 0)), s"baseline day $d quiet")
    for (d <- 1 to 3)
      assert(out((2L, f"2024-01-0$d")) == ((1L, 0)),
        "zero-variance key never flags (strict >)")
  }

  test("funnel: strict ordering, greedy-earliest chain, stall sentinels, window flag") {
    def us(t: java.sql.Timestamp) = t.getTime * 1000L
    val ev = Seq(
      // user 1 completes in order: view@d0h1, click@d0h3, purchase@d0h5
      (1L, "view", ts(0, 1)), (1L, "click", ts(0, 3)), (1L, "purchase", ts(0, 5)),
      // pre-view click must not count: the chain uses the later click
      (1L, "click", ts(0, 0)),
      // user 2 stalls after view (their purchase precedes any click)
      (2L, "view", ts(0, 2)), (2L, "purchase", ts(0, 1)),
      // user 3 completes but outside a 4-hour window
      (3L, "view", ts(0, 1)), (3L, "click", ts(0, 2)), (3L, "purchase", ts(1, 1)),
      // user 4 never views -> absent
      (4L, "click", ts(0, 1)), (4L, "purchase", ts(0, 2))
    ).toDF("user_id", "event_type", "t")
    val out = EventFeatures.funnel(ev, "t", "user_id", "event_type",
        Seq("view", "click", "purchase"), windowMicros = 4L * 3600 * 1000000)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), "non-viewers absent")
    assert(out(1L) == ((us(ts(0, 1)), us(ts(0, 3)), us(ts(0, 5)), 3, 1)),
      "greedy chain skips the pre-view click and completes within window")
    assert(out(2L) == ((us(ts(0, 2)), -1L, -1L, 1, 0)),
      "stalled user keeps -1 sentinels and converted=0")
    assert(out(3L)._4 == 3 && out(3L)._5 == 0,
      "completion outside the window reaches step 3 but does not convert")
  }

  test("retentionCohorts: epoch-week cohorts, forward offsets, pre-cohort activity excluded") {
    def week(day: Int) = java.time.LocalDate.of(2024, 1, day + 1).toEpochDay / 7
    val ev = Seq(
      // user 1: signup day 0; active days 0, 8, 22 -> offsets 0, 1, 3
      (1L, "signup", ts(0, 1)), (1L, "click", ts(8, 1)), (1L, "view", ts(22, 1)),
      // user 2: signup day 8 (week +1); pre-signup view day 2 excluded
      (2L, "view", ts(2, 1)), (2L, "signup", ts(8, 2)),
      // user 3: never signs up -> in no cohort
      (3L, "view", ts(0, 3))
    ).toDF("user_id", "event_type", "t")
    val got = EventFeatures.retentionCohorts(ev, "t", "user_id",
        col("event_type") === "signup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val w0 = week(0); val w1 = week(8)
    assert(w1 == w0 + 1, "fixture sanity: day 8 is the next epoch week")
    assert(got == Map(
      (w0, 0L) -> ((1L, 1L)), (w0, 1L) -> ((1L, 1L)), (w0, 3L) -> ((1L, 1L)),
      (w1, 0L) -> ((1L, 1L))),
      s"unexpected matrix: $got")
  }

  test("dailyAnomalies: single-day key unflagged; boundary is strict") {
    // exactly-at-threshold must NOT flag: user 3 has counts 1,3 ->
    // mean 2, std 1; z=1 -> threshold 3.0; the 3-count day sits ON it
    val ev = (Seq((3L, ts(0, 1))) ++ (0 until 3).map(h => (3L, ts(1, h + 1))) ++
        Seq((4L, ts(0, 1))))
      .toDF("user_id", "t")
    val out = EventFeatures.dailyAnomalies(ev, "t", "user_id", z = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getInt(3)).toMap
    assert(out((3L, "2024-01-02")) == 0, "count == mean + z*std is not an anomaly")
    assert(out((4L, "2024-01-01")) == 0, "single-day key has zero variance")
  }

  test("ewmaWeekly: closed form equals the sequential recurrence, partition-invariant") {
    // key 'a': weekly counts 4, 2, 8 over three OBSERVED weeks (with a
    // calendar gap before the last — the recurrence runs on observed
    // ranks): l0=4, l1=0.5*2+0.5*4=3, l2=0.5*8+0.5*3=5.5
    def tsDay(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val ev = (
      (1 to 4).map(_ => ("a", tsDay(0))) ++    // week w0: 4 events
      (1 to 2).map(_ => ("a", tsDay(7))) ++    // week w0+1: 2 events
      (1 to 8).map(_ => ("a", tsDay(21))) ++   // week w0+3 (gap): 8 events
      Seq(("b", tsDay(0)))                     // single-week key: l0 = n
    ).toDF("k", "t")
    def levels(df: org.apache.spark.sql.DataFrame) =
      EventFeatures.ewmaWeekly(df, "t", "k")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val got = levels(ev)
    val weeks = got.keys.filter(_._1 == "a").map(_._2).toSeq.sorted
    assert(got(("a", weeks(0))) == ((4L, 4.0)))
    assert(got(("a", weeks(1))) == ((2L, 3.0)))
    assert(got(("a", weeks(2))) == ((8L, 5.5)), s"gap week: ${got(("a", weeks(2)))}")
    assert(got.find(_._1._1 == "b").get._2 == ((1L, 1.0)))
    // dyadic exactness: any partitioning produces identical bits
    assert(levels(ev.repartition(7)) == got)
  }

  test("resampleCounts: dense grid with explicit zero gaps, shared span") {
    // hours 1 and 4 active for user-type 'a' (gap at 2,3); 'b' only
    // hour 2 — but the grid spans the CORPUS [1,4] for both keys
    val ev = Seq(
      ("a", ts(0, 1)), ("a", ts(0, 1)), ("a", ts(0, 4)),
      ("b", ts(0, 2))
    ).toDF("k", "t")
    val got = EventFeatures.resampleCounts(ev, "t", "k", bucketSeconds = 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h0 = got.keys.map(_._2).min
    // 4 buckets x 2 keys = 8 rows, gaps explicit
    assert(got.size == 8, s"grid size: ${got.size}")
    assert(got(("a", h0)) == 2L && got(("a", h0 + 3)) == 1L)
    assert(got(("a", h0 + 1)) == 0L && got(("a", h0 + 2)) == 0L,
      "gaps must be explicit zeros")
    assert(got(("b", h0 + 1)) == 1L && got(("b", h0)) == 0L)
    assertThrows[IllegalArgumentException](
      EventFeatures.resampleCounts(ev, "t", "k", 0L))
  }

  test("pathCounts: per-key windows, deterministic top-k cut, plan shape") {
    val ev = Seq(
      // user 1: v c p v c  -> paths v>c>p, c>p>v, p>v>c
      (1L, 1L, "v"), (1L, 2L, "c"), (1L, 3L, "p"), (1L, 4L, "v"), (1L, 5L, "c"),
      // user 2: v c p -> v>c>p again (so v>c>p leads with 2)
      (2L, 6L, "v"), (2L, 7L, "c"), (2L, 8L, "p"),
      // user 3: too short for depth 3
      (3L, 9L, "v"), (3L, 10L, "c")
    ).map { case (u, e, t0) => (u, e, t0, ts(0, e.toInt)) }
      .toDF("user_id", "event_id", "event_type", "t")
    val out = EventFeatures.pathCounts(ev, "t", "user_id", "event_type", "event_id",
      depth = 3, k = 2)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // top: v>c>p (2); then the 1-count paths tie — 'c>p>v' wins asc
    assert(got == Seq(("v>c>p", 2L), ("c>p>v", 1L)), s"got $got")
    // AQE prints initial+final plans — scope to the final segment
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a global sort:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      s"both leads must share ONE window node:\n$plan")
    assertThrows[IllegalArgumentException](
      EventFeatures.pathCounts(ev, "t", "user_id", "event_type", "event_id", depth = 1))
  }

  test("decayedCounts: hand-computed dyadic sum; staircase half-life; partition-invariant") {
    // user 1: 3 events on dmax (2^0 each), 2 on dmax-1 (2^-1), 1 on
    // dmax-3 (2^-3) -> 3 + 1 + 0.125 = 4.125 exactly
    val ev = ((1 to 3).map(h => (1L, ts(3, h))) ++ (1 to 2).map(h => (1L, ts(2, h))) ++
      Seq((1L, ts(0, 1)), (2L, ts(3, 5)))).toDF("user_id", "t")
    val got = EventFeatures.decayedCounts(ev, "t", "user_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((6L, 4.125)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((1L, 1.0)))
    // staircase: halfLife 2 floors the offset — day offsets 0,1,3 ->
    // exponents 0,0,1: 3 + 2 + 0.5 = 5.5
    val h2 = EventFeatures.decayedCounts(ev, "t", "user_id", halfLifeDays = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h2(1L) == 5.5, s"staircase: ${h2(1L)}")
    // the dyadic-exactness claim: any partitioning sums identically
    val repart = EventFeatures.decayedCounts(ev.repartition(7), "t", "user_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(repart(1L) == 4.125 && repart(2L) == 1.0)
    assertThrows[IllegalArgumentException](
      EventFeatures.decayedCounts(ev, "t", "user_id", halfLifeDays = 0))
  }

  test("transitionCounts: per-key consecutive pairs, tie broken by the order col") {
    val ev = Seq(
      // user 1: view -> click -> purchase (pairs: v->c, c->p)
      (1L, 10L, "view", ts(0, 1)), (1L, 11L, "click", ts(0, 2)),
      (1L, 12L, "purchase", ts(0, 3)),
      // user 2: two views at the SAME ts — event_id must break the tie,
      // then a click (pairs: v->v, v->c)
      (2L, 20L, "view", ts(0, 4)), (2L, 21L, "view", ts(0, 4)),
      (2L, 22L, "click", ts(0, 5)),
      // user 3: single event -> contributes no pair
      (3L, 30L, "view", ts(0, 6))
    ).toDF("user_id", "event_id", "event_type", "t")
    val got = EventFeatures.transitionCounts(ev, "t", "user_id", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 3L)),
      ("view", "view") -> ((1L, 3L)),
      ("click", "purchase") -> ((1L, 1L))),
      s"unexpected transitions: $got")
  }

  test("transitionCounts: lead window is key-partitioned (scale guard)") {
    val ev = Seq((1L, 10L, "view", ts(0, 1))).toDF("user_id", "event_id", "event_type", "t")
    val plan = EventFeatures.transitionCounts(ev, "t", "user_id", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"transition window must not serialize through one task:\n$plan")
  }

  test("rfmScores: metrics and exact rank buckets on a 5-user fixture") {
    // n=5, buckets=5 -> idx*5/5+1 = idx+1: every user gets a distinct
    // score per axis, so the whole bucket assignment is pinned.
    val ev = (
      Seq((1L, "view", 999.0, ts(0, 1))) ++                  // r_days=4 f=1 m=0
      Seq((2L, "view", 999.0, ts(1, 1)), (2L, "purchase", 10.0, ts(1, 2))) ++
      Seq((3L, "view", 999.0, ts(2, 1)), (3L, "view", 999.0, ts(2, 2)),
          (3L, "purchase", 5.5, ts(2, 3))) ++
      (1 to 4).map(h => (4L, "view", 999.0, ts(3, h))) ++    // no purchase
      ((1 to 4).map(h => (5L, "view", 999.0, ts(4, h))) :+
        (5L, "purchase", 20.25, ts(4, 5)))
    ).toDF("user_id", "event_type", "value", "t")
    val got = EventFeatures.rfmScores(ev, "t", "user_id", "event_type", "value",
        monetaryType = "purchase")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // non-purchase values (999.0) must not leak into m; users without a
    // purchase get m = 0.0 and tie on m, broken by user_id (1 before 4)
    assert(got(1L) == ((4L, 1L, 0.0, 1L, 1L, 1L)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((3L, 2L, 10.0, 2L, 2L, 4L)), s"user 2: ${got(2L)}")
    assert(got(3L) == ((2L, 3L, 5.5, 3L, 3L, 3L)), s"user 3: ${got(3L)}")
    assert(got(4L) == ((1L, 4L, 0.0, 4L, 4L, 2L)), s"user 4: ${got(4L)}")
    assert(got(5L) == ((0L, 5L, 20.25, 5L, 5L, 5L)), s"user 5: ${got(5L)}")
  }

  test("rfmScores: no single-task window in the plan (scale guard)") {
    val ev = Seq((1L, "view", 1.0, ts(0, 1))).toDF("user_id", "event_type", "value", "t")
    val plan = EventFeatures.rfmScores(ev, "t", "user_id", "event_type", "value", "purchase")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"rfm scores must come from rank buckets, not an ntile window:\n$plan")
  }

  test("rfmScores rejects degenerate bucket counts; empty input yields empty frame") {
    val ev = Seq((1L, "view", 1.0, ts(0, 1))).toDF("user_id", "event_type", "value", "t")
    assertThrows[IllegalArgumentException](
      EventFeatures.rfmScores(ev, "t", "user_id", "event_type", "value", "purchase", buckets = 1))
    val empty = EventFeatures.rfmScores(ev.filter(lit(false)),
      "t", "user_id", "event_type", "value", "purchase")
    assert(empty.columns.toSeq == Seq(
      "user_id", "r_days", "f", "m", "r_score", "f_score", "m_score"))
    assert(empty.count() == 0)
  }
}
