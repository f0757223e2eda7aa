package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the REAL testdata events.parquet contract — the r10 postmortem
  * gap. Every prior suite built its own event fixtures, so when the
  * driver regenerated events.parquet with a different timestamp
  * physical type (ns→µs), `sbt test` stayed green while six
  * CORRECTNESS entries silently broke (all timestamps compressed
  * 1000×, 30 days of events collapsing into ~43 minutes of 1970).
  *
  * These tests read the actual /root/testdata files, so a future
  * regeneration that shifts precision, renames a column, or collapses
  * the time span fails HERE, in-repo, before the driver's oracle run.
  */
class EventsContractSpec extends SparkTestBase {

  private def events = SparkEntry.queries // catalog under test

  test("events.parquet physical schema: ts is a timestamp, not an int64") {
    val inferred = spark.read.parquet(s"$sfDir/events.parquet").schema
    val ts = inferred("ts").dataType
    assert(ts == TimestampType || ts == TimestampNTZType,
      s"events.ts inferred as $ts — testdata regenerated with a new " +
        "physical type; update Queries.eventsSchema AND the oracle SQL")
    val names = inferred.fields.map(_.name).toSeq
    assert(names == Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("event time is epoch-plausible and spans days, not minutes") {
    // The 1000× compression bug put every event in Jan 1970 within a
    // ~43-minute span. Real data: 2024+, ≥ 7-day span even at sf0.001.
    // inference yields TIMESTAMP_NTZ (isAdjustedToUTC=false); cast to
    // TimestampType (session TZ = UTC, so values are unchanged)
    val row = spark.read.parquet(s"$sfDir/events.parquet")
      .select(min(unix_micros(col("ts").cast(TimestampType))).as("lo"),
        max(unix_micros(col("ts").cast(TimestampType))).as("hi"))
      .head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val us2020 = 1577836800L * 1000000L
    assert(lo > us2020, s"min event ts $lo µs is before 2020 — precision regression")
    assert(hi - lo > 7L * 86400L * 1000000L,
      s"event span ${(hi - lo) / 1000000L} s — collapsed time axis")
  }

  test("x_sessionize: multiple sessions per user (gap structure intact)") {
    val sessions = events("x_sessionize")(spark, sfDir)
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    val n = sessions.count()
    assert(n > users,
      s"$n sessions for $users users — exactly one session per user means " +
        "the gap comparison degenerated (timestamp-precision regression)")
  }

  test("a4_unique_daily: day grouping resolves to real calendar days") {
    val a4 = events("a4_unique_daily")(spark, sfDir)
    val days = a4.select(countDistinct(col("event_day"))).head().getLong(0)
    assert(days > 3, s"only $days distinct event days — time axis collapsed")
    assert(a4.filter(col("event_day") < "2020-01-01").isEmpty,
      "a4_unique_daily emitted pre-2020 days — epoch regression")
  }

  test("x_asof_join emits epoch-µs values in the data's real era") {
    val asof = events("x_asof_join")(spark, sfDir)
    val us2020 = 1577836800L * 1000000L
    assert(asof.filter(col("purchase_us") < us2020).isEmpty,
      "purchase_us below 2020 — ts scaling broke")
    assert(asof.count() > 0)
  }

  test("x_interval_join: 1-hour window is selective, not span-covering") {
    // With the 1000× bug the \"1 hour\" window covered ~all prior events;
    // pairs-per-purchase exploded. Real data: windows match only a small
    // fraction of purchases.
    val purchases = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase").count()
    val joined = events("x_interval_join")(spark, sfDir).count()
    assert(joined < purchases,
      s"$joined interval-join groups vs $purchases purchases — the window " +
        "matched nearly everything; time axis is compressed")
  }
}
