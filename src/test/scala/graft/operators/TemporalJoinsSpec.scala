package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  // seeded random (key, ts, value) tables with deliberate ts collisions
  private def genRows(seed: Int, n: Int, keys: Int, tsRange: Long): Seq[(Long, Timestamp, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(keys).toLong,
      ts(rnd.nextLong(tsRange) * 1000L), // ms-aligned so collisions occur
      (rnd.nextInt(1000) / 10.0)))
  }

  test("asofBackward matches the brute-force latest-prior row (inclusive and strict)") {
    for (seed <- 1 to 3; strict <- Seq(false, true)) {
      val lRows = genRows(seed, 80, 5, 2000)
      val rRows = genRows(seed + 100, 120, 5, 2000)
      val l = lRows.toDF("k", "t", "lv")
      val r = rRows.toDF("k", "t", "rv")
      val got = TemporalJoins.asofBackward(l, r, Seq("k"), "t", "t",
          Seq("rv"), prefix = "p_", strict = strict)
        .select("k", "t", "lv", "p_rv", "p_t")
        .collect()
        .map(row => (row.getLong(0), row.getTimestamp(1), row.getDouble(2),
          Option(row.get(3)).map(_.asInstanceOf[Double]),
          Option(row.get(4)).map(_.asInstanceOf[Timestamp])))
        .toSet
      val expected = lRows.map { case (k, t, lv) =>
        val candidates = rRows.filter { case (rk, rt, _) =>
          rk == k && (if (strict) rt.before(t) else !rt.after(t))
        }
        // operator tie-break: max payload struct (rv, then ts) among max-ts rows
        val best = candidates
          .sortBy { case (_, rt, rv) => (rt.getTime, rv) }
          .lastOption
        (k, t, lv, best.map(_._3), best.map(_._2))
      }.toSet
      assert(got == expected, s"seed=$seed strict=$strict")
    }
  }

  test("asofBackward tolerance nulls out matches older than the lookback") {
    val l = Seq((1L, ts(10L * 1000000), "a"), (1L, ts(100L * 1000000), "b")).toDF("k", "t", "tag")
    val r = Seq((1L, ts(5L * 1000000), 7.0)).toDF("k", "t", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some(expr("INTERVAL 10 SECONDS")))
      .select("tag", "asof_v").collect()
      .map(row => row.getString(0) -> Option(row.get(1))).toMap
    // 10s-ago row is within tolerance of t=10 but not of t=100
    assert(got == Map("a" -> Some(7.0), "b" -> None))
  }

  test("asofBackward drops null-ts right rows and matches nothing for null-ts left rows") {
    val l = Seq((1L, Option(ts(10L * 1000000)), "a"), (1L, Option.empty[Timestamp], "n")).toDF("k", "t", "tag")
    val r = Seq((1L, Option(ts(5L * 1000000)), 7.0), (1L, Option.empty[Timestamp], 9.0)).toDF("k", "t", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "t", "t", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(row => row.getString(0) -> Option(row.get(1))).toMap
    assert(got == Map("a" -> Some(7.0), "n" -> None))
  }

  test("intervalJoin matches the brute-force range predicate, boundaries exact") {
    for (seed <- 1 to 3; (lo, hi) <- Seq((-3600L, 0L), (0L, 60L), (-100L, 100L))) {
      val loU = lo * 1000000L
      val hiU = hi * 1000000L
      val lRows = genRows(seed, 60, 4, 5000)
      val rRows = genRows(seed + 50, 90, 4, 5000)
      val got = TemporalJoins.intervalJoin(
          lRows.toDF("k", "t", "lv"), rRows.toDF("k", "t", "rv"),
          Seq("k"), "t", "t", loU, hiU, Seq("rv"))
        .select("k", "t", "lv", "r_rv", "r_t").collect()
        .map(row => (row.getLong(0), row.getTimestamp(1), row.getDouble(2),
          row.getDouble(3), row.getTimestamp(4)))
        .toSeq.sortBy(r => (r._1, r._2.getTime, r._4, r._5.getTime))
      val expected = (for {
        (k, t, lv) <- lRows
        (rk, rt, rv) <- rRows
        tU = t.getTime * 1000L
        rtU = rt.getTime * 1000L
        if rk == k && rtU >= tU + loU && rtU < tU + hiU
      } yield (k, t, lv, rv, rt))
        .sortBy(r => (r._1, r._2.getTime, r._4, r._5.getTime))
      assert(got == expected, s"seed=$seed interval=[$lo,$hi)")
    }
  }

  test("intervalJoin boundary semantics: lower inclusive, upper exclusive") {
    val l = Seq((1L, ts(1000L * 1000000), "x")).toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts(900L * 1000000), "at_lower"),   // t-100: included
      (1L, ts(1000L * 1000000), "at_upper"),  // t:     excluded
      (1L, ts(899999999L), "below_lower")     // t-100-1us: excluded
    ).toDF("k", "t", "which")
    val got = TemporalJoins.intervalJoin(l, r, Seq("k"), "t", "t",
        -100L * 1000000, 0L, Seq("which"))
      .select("r_which").collect().map(_.getString(0)).toSet
    assert(got == Set("at_lower"))
  }

  test("intervalJoin explodes the left side at most 2x") {
    val l = genRows(7, 50, 3, 5000).toDF("k", "t", "lv")
    val exploded = l
      .filter(col("t").isNotNull)
      .withColumn("__a", unix_micros(col("t")) - lit(3600L * 1000000))
      .withColumn("__bucket", explode(sequence(
        ((col("__a") - pmod(col("__a"), lit(3600000000L))) / lit(3600000000L)).cast("long"),
        (((col("__a") + lit(3599999999L)) - pmod(col("__a") + lit(3599999999L), lit(3600000000L))) / lit(3600000000L)).cast("long"))))
    assert(exploded.count() <= 2 * l.count())
  }
}
