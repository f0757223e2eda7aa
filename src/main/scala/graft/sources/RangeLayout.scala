package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Sort-clustered ("zone-map friendly") parquet layout — the data-
  * skipping counterpart to [[Bucketing]] (which co-locates JOIN keys)
  * and [[Compaction]] (which fixes file sizes). Range-partitioning the
  * rows on the filter columns and sorting within each file makes every
  * parquet row-group's min/max statistics TIGHT on those columns, so a
  * selective range predicate at read time skips whole row groups (and
  * with one row group per file, whole files) instead of scanning and
  * discarding. At 100 TB this is the difference between a scan priced
  * by the PREDICATE's selectivity and one priced by the table size —
  * the same motivation as Delta/Iceberg Z-ordering; for a single-column
  * (or prefix-ordered) predicate set, plain range-sort IS the optimal
  * z-order.
  *
  * `write` costs one range shuffle: `repartitionByRange` samples the
  * sort key (driver gets only the boundary quantiles, never data rows)
  * and `sortWithinPartitions` sorts each output task's slice — spill-
  * safe external sort, no global sort barrier. Readers need nothing
  * special: Spark pushes range predicates to the parquet reader
  * (`PushedFilters` in the plan), which evaluates them against
  * row-group stats — RangeLayoutSpec asserts the skipping by comparing
  * the scan node's output-row metric against an unsorted copy.
  */
object RangeLayout {

  /** Rewrite `df` under `outDir` clustered by `sortCols`: `numFiles`
    * range slices, each sorted. Layout is content-neutral — readers see
    * the same rows.
    */
  def write(
      df: DataFrame,
      outDir: String,
      sortCols: Seq[String],
      numFiles: Int
  ): Unit = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Read back a range-laid-out dataset. Plain `spark.read.parquet` —
    * exists so call sites document that pruning needs no special reader.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
