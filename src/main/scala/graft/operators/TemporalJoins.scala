package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal joins Spark lacks as built-ins: as-of (latest-prior) and
  * bounded-interval (range) joins over event streams.
  *
  * The reference has no temporal operators (its events are processed
  * per-file, reference src/main.py:34-55), but a training-data event
  * pipeline needs both shapes constantly: "attach the user's latest
  * profile snapshot as of each interaction" (as-of) and "all events
  * within the hour before each conversion" (interval). Both are
  * expressed WITHOUT a range-predicate join — Spark would execute that
  * as a broadcast nested loop (corpus × corpus comparisons at 100 TB):
  *
  *  - as-of: union both sides, ONE shuffle on the key, one ordered
  *    window pass carrying the latest right payload forward
  *    (`last(..., ignoreNulls)`) — the distributed equivalent of a
  *    sort-merge as-of.
  *  - interval: quantize time into buckets exactly as wide as the
  *    interval, equi-join on (key, bucket) with each left row exploded
  *    into the ≤ 2 buckets its window overlaps, then the exact range
  *    filter. Shuffle volume is 2× the inputs, never |L|×|R|.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, the single most recent
    * right row with the same `keyCols` and `right.ts <= left.ts`
    * (`< left.ts` when `strict`). Returns every left row (left-outer
    * semantics) with `prefix`-named columns for the chosen right
    * payload and its timestamp — all null when no right row qualifies,
    * or when the qualifying row is older than `tolerance` (an interval
    * column, e.g. `expr("INTERVAL 1 HOUR")`).
    *
    * Determinism: right rows tying on (key, ts) are resolved to the
    * one with the LARGEST payload struct (field-by-field comparison of
    * `rightCols` in the given order) — a total order, so the result
    * never depends on partitioning.
    *
    * Plan shape: one hash shuffle on `keyCols` (the union of both
    * sides), one window sort — no range join, no per-row probe. Skew
    * caveat: a window is sequential WITHIN a key, so one pathologically
    * hot key (≫ one task's worth of rows) serializes on one core;
    * pre-split such keys by a coarse time bucket and as-of join the
    * bucket boundaries separately if you have them.
    *
    * Left rows with a null `leftTsCol` match nothing; right rows with
    * a null `rightTsCol` are dropped (a row with no event time cannot
    * be "before" anything).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightCols: Seq[String],
      prefix: String = "asof_",
      strict: Boolean = false,
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col) :+ col(rightTsCol).as("__ts"): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftStructType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType

    // side ordering makes the <= / < boundary exact: inclusive puts
    // right rows BEFORE the left row at equal ts (visible to last()),
    // strict puts them after (outside the frame)
    val rightSide = if (strict) 2 else 0
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__t"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
    val r = right
      .filter(col(rightTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("__t"),
          lit(rightSide).as("__side"),
          lit(null).cast(leftStructType).as("__l"),
          payload.as("__r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchCol = tolerance match {
      case Some(tol) =>
        val m = last(col("__r"), ignoreNulls = true).over(w)
        when(m("__ts") >= col("__t") - tol, m)
      case None => last(col("__r"), ignoreNulls = true).over(w)
    }

    l.unionByName(r)
      .withColumn("__m", matchCol)
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightCols.map(c => col(s"__m.$c").as(prefix + c)) :+
          col("__m.__ts").as(prefix + rightTsCol): _*)
  }

  /** Interval (range) join: all (left, right) pairs sharing `keyCols`
    * with `right.ts ∈ [left.ts + lowerMicros, left.ts + upperMicros)`
    * — e.g. lower=-3600e6, upper=0 is "the hour strictly before each
    * left event". Returns inner-join pairs: every left column plus the
    * `prefix`-named right payload and right timestamp.
    *
    * Plan shape: both sides are quantized to time buckets exactly
    * `upperMicros - lowerMicros` wide; a left window then overlaps at
    * most TWO buckets, so the left side explodes ≤ 2× and the join is
    * a plain equi-join on (key, bucket) with the exact range predicate
    * as a post-filter. Bucket arithmetic is exact Long floor-division
    * (via pmod), safe for pre-1970 timestamps. Null timestamps on
    * either side never match.
    *
    * The quadratic term is per (key, bucket): a key with B right rows
    * in one bucket meets each overlapping left row individually, which
    * is the output's own size — there is no hidden blowup beyond the
    * true result cardinality (plus the ≤ 2× probe duplication).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      lowerMicros: Long,
      upperMicros: Long,
      rightCols: Seq[String],
      prefix: String = "r_"
  ): DataFrame = {
    require(upperMicros > lowerMicros,
      s"empty interval: [$lowerMicros, $upperMicros)")
    val w = upperMicros - lowerMicros
    // exact floor division on Longs: (x - pmod(x, w)) is divisible by
    // w, and the double-precision quotient of two exactly-representable
    // longs with an integer ratio is exact
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(w))) / lit(w)).cast(LongType)

    val leftCols = left.columns.toSeq
    val lq = left
      .filter(col(leftTsCol).isNotNull)
      .withColumn("__a", unix_micros(col(leftTsCol)) + lit(lowerMicros))
      // window [a, a+w) overlaps buckets floor(a/w) .. floor((a+w-1)/w)
      .withColumn("__bucket",
        explode(sequence(floorDiv(col("__a")), floorDiv(col("__a") + lit(w - 1)))))
    val rq = right
      .filter(col(rightTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          unix_micros(col(rightTsCol)).as("__rt"),
          struct(rightCols.map(col) :+ col(rightTsCol).as("__ts"): _*).as("__r")): _*)
      .withColumn("__bucket", floorDiv(col("__rt")))

    lq.join(rq, keyCols :+ "__bucket")
      .filter(col("__rt") >= col("__a") && col("__rt") < col("__a") + lit(w))
      .select(
        leftCols.map(col) ++
          rightCols.map(c => col(s"__r.$c").as(prefix + c)) :+
          col("__r.__ts").as(prefix + rightTsCol): _*)
  }
}
