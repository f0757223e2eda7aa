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
}
