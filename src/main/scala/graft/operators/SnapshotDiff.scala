package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the audit face of CDC maintenance: given two
  * versions of a table, classify every key as added / removed /
  * changed. The inverse direction of [[Upsert.mergeSnapshot]] (which
  * APPLIES a change set); together they close the loop: diff two
  * snapshots to recover a change feed, merge a change feed to advance a
  * snapshot. Everyday uses at pipeline scale: did this rebuild change
  * anything it shouldn't have, what did yesterday's ingest actually
  * touch, reconcile a migrated copy against its source.
  *
  * Scale shape: [[diff]] projects each side to (keys, xxhash64(payload))
  * BEFORE the full-outer join, so the one shuffle per side carries a
  * fixed ~16-byte row regardless of how wide the table is — diffing two
  * 100 TB snapshots moves only key+hash. Equality via a 64-bit content
  * hash is exact up to hash collision (2⁻⁶⁴ per colliding pair;
  * reconciliation jobs accept this, and a paranoid caller can re-verify
  * the 'changed' keys — a tiny set — against full payloads).
  * [[diffDetailed]] is that re-verify: it carries the named compare
  * columns through the join and reports WHICH columns changed, so it
  * costs payload-width shuffle and is meant for the changed subset or
  * narrow tables, not the first pass.
  */
object SnapshotDiff {

  /** Change classification per key between `oldSnap` and `newSnap`:
    * key columns + `change_type` in ('added', 'removed', 'changed').
    * Unchanged keys are omitted unless `includeUnchanged`. Both frames
    * must share the same column set; all non-key columns are compared
    * (via content hash — see object doc).
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      includeUnchanged: Boolean = false
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payloadCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(newSnap.columns.toSet == oldSnap.columns.toSet,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    // identical column ORDER on both sides (hash equality must mean
    // content equality, not layout equality), and an explicit null
    // marker per column: xxhash64 SKIPS null inputs, so without the
    // marker (null, x) and (x, null) would collide
    def hashed(df: DataFrame, hashName: String) =
      df.select(keyCols.map(col) :+
        xxhash64(payloadCols.flatMap(c =>
          Seq(col(c).isNull.cast("int"), col(c))): _*).as(hashName): _*)
    val joined = hashed(oldSnap, "__old_hash")
      .join(hashed(newSnap, "__new_hash"), keyCols, "full_outer")
    val classified = joined.select(keyCols.map(col) :+
      when(col("__new_hash").isNull, lit("removed"))
        .when(col("__old_hash").isNull, lit("added"))
        .when(col("__old_hash") =!= col("__new_hash"), lit("changed"))
        .otherwise(lit("unchanged")).as("change_type"): _*)
    if (includeUnchanged) classified
    else classified.filter(col("change_type") =!= "unchanged")
  }

  /** Column-level diff over `compareCols`: key columns + `change_type`
    * + `changed_cols` (sorted array of compare-column names whose
    * values differ, null-safely; empty for added/removed keys). Carries
    * the compared payload through the join — run it on [[diff]]'s
    * changed keys or on narrow tables.
    */
  def diffDetailed(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def side(df: DataFrame, p: String, mark: String) =
      df.select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"$p$c")) :+
        lit(true).as(mark): _*)
    val joined = side(oldSnap, "__o_", "__in_old")
      .join(side(newSnap, "__n_", "__in_new"), keyCols, "full_outer")
    val diffs = compareCols.sorted.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    joined.select(keyCols.map(col) ++ Seq(
      when(col("__in_new").isNull, lit("removed"))
        .when(col("__in_old").isNull, lit("added"))
        .when(size(filter(array(diffs: _*), x => x.isNotNull)) > 0, lit("changed"))
        .otherwise(lit("unchanged")).as("change_type"),
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        filter(array(diffs: _*), x => x.isNotNull))
        .otherwise(array().cast("array<string>")).as("changed_cols")): _*)
      .filter(col("change_type") =!= "unchanged")
  }
}
