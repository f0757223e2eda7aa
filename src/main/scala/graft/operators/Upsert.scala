package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins snapshot maintenance — the merge step of a CDC /
  * incremental-ingest pipeline: fold a batch of keyed updates (and
  * tombstones) into the previous snapshot.
  *
  * The scale-right shape is the same `max_by` algebraic aggregation the
  * exact-dedup family uses, NOT a row_number window: one shuffle on the
  * merge keys with map-side partial combine — each input partition
  * reduces to ONE candidate row per key before shuffling, so a hot key
  * with 10⁷ pending versions crosses the wire as one row per upstream
  * partition. The row-valued `max_by` buffer isn't hash-aggregable, so
  * Spark plans a SortAggregate: a spill-safe per-partition sort on the
  * key followed by a streaming single-row-per-key reduce. Contrast a
  * window formulation, which must co-locate and rank EVERY version of
  * a key through one reducer's window buffer before discarding all but
  * one row.
  */
object Upsert {

  /** Merge `updates` into `snapshot` by `keyCols`.
    *
    * Both frames must share the snapshot's schema (checked by
    * `unionByName`). The survivor per key is the row with the highest
    * `(versionCol, source)` — updates outrank the snapshot at equal
    * version — with an `xxhash64` content tie-break so equal-version
    * duplicate updates resolve deterministically. Rows whose
    * `deleteCol` is true after the merge are tombstones: dropped from
    * the result (a delete only wins if it IS the surviving version, so
    * a later re-insert resurrects the key, as CDC replay requires).
    * Keys present only in `updates` are inserts — no anti-join needed,
    * the union handles them.
    */
  def mergeSnapshot(
      snapshot: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      deleteCol: Option[String] = None
  ): DataFrame = {
    val all = snapshot.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val payloadCols = all.columns.filterNot(_ == "__src").toIndexedSeq
    val payload = struct(payloadCols.map(col): _*)
    val ord = struct(col(versionCol), col("__src"), xxhash64(payload))
    val merged = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
    deleteCol match {
      case Some(c) => merged.filter(!coalesce(col(c), lit(false)))
      case None    => merged
    }
  }

  /** Type-2 slowly-changing-dimension HISTORIZATION: turn a keyed
    * change stream into validity intervals — for each key, one row per
    * state RUN (consecutive events with the same state collapse) with
    * `valid_from_us` / `valid_to_us` half-open interval bounds, the
    * last run open (`valid_to_us` = −1 sentinel, so the frame stays
    * integer-typed and hash-exact). This is the warehouse SCD2 shape:
    * "what was this customer's tier ON this date" answers with one
    * interval probe instead of a scan-back through the event log.
    *
    * Change detection is a NULL-SAFE `state ≠ lag(state)` over the
    * per-key (ts, tieBreak) order (a null state starts its own run
    * and is historized like any other value, rather than being
    * silently absorbed into the preceding interval); interval close
    * is `lead(ts)` over the
    * surviving change rows. `tieBreakCol` must make the order unique
    * per key (same contract as the transition/path operators) — two
    * different states at one identical timestamp historize in
    * tie-break order, each getting a zero-length interval rather than
    * a nondeterministic winner.
    *
    * Plan shape: both windows are key-partitioned over the SAME
    * shuffle (the change filter between them is a projection, so
    * Spark reuses the partitioning — one exchange total); per-key
    * state is one lag/lead row. Output is bounded by the number of
    * state CHANGES, ≪ events for any real entity stream.
    */
  def stateIntervals(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieBreakCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__tb"))
    // lag over a 1-field struct so "no previous row" (null struct) is
    // distinguishable from "previous state was null" (struct with null
    // field); the null-safe <=> then lets null states start their own
    // runs instead of being silently absorbed into the preceding one.
    val changes = df
      .select(col(keyCol), col(stateCol).as("state"),
        unix_micros(col(tsCol)).as("__t"), col(tieBreakCol).as("__tb"))
      .withColumn("__prev", lag(struct(col("state")), 1).over(w))
      .filter(col("__prev").isNull ||
        !(col("__prev")("state") <=> col("state")))
      .drop("__prev")
    val w2 = w
    changes
      .select(col(keyCol), col("state"),
        col("__t").as("valid_from_us"),
        coalesce(lead(col("__t"), 1).over(w2), lit(-1L)).as("valid_to_us"))
  }
}
