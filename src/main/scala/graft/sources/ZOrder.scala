package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — the multi-column
  * member of the layout family: [[Bucketing]] co-locates JOIN keys,
  * [[RangeLayout]] clusters ONE filter column, Z-order clusters
  * SEVERAL at once, so selective predicates on ANY of the z-columns
  * (or their conjunctions) skip row groups. The same idea as
  * Delta/Iceberg `ZORDER BY`, built from Spark primitives.
  *
  * Each column maps to its quantile bucket — `approxQuantile`
  * boundaries, computed in ONE distributed pass over all columns and
  * shipped as a plan-constant table into the
  * [[graft.functions.ZValueExpr]] codegen kernel — and the bucket bits
  * interleave into a single long. Bucketing by RANK rather than by
  * linear min/max scaling is what keeps the curve balanced under
  * skew: a heavy value burns one bucket, not the whole range. The
  * write is then exactly a range layout on the z-value: one range
  * shuffle (sampled boundaries — the driver never sees data rows),
  * per-file sort, tight min/max on every z-column in every row group.
  *
  * Resolution is 256 buckets/column (8 bits; ≤ 8 columns fit the
  * 64-bit z-value) — finer than the file count matters for skipping,
  * so there is nothing to tune at 100 TB beyond `numFiles`.
  */
object ZOrder {

  private val Resolution = 256

  /** Rewrite `df` under `outDir` z-ordered on `cols` (2-8 numeric
    * columns): `numFiles` range slices of the z-value, each sorted by
    * it. Content-neutral; nulls cluster into the lowest bucket.
    */
  def write(
      df: DataFrame,
      outDir: String,
      cols: Seq[String],
      numFiles: Int
  ): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order needs 2-8 columns, got ${cols.size} (one column: use RangeLayout)")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val probs = (1 until Resolution).map(_.toDouble / Resolution).toArray
    // one pass over all z-columns; boundary table is cols × 255 doubles
    // — the bounded driver payload the kernel ships as a reference
    val boundaries = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val z = graft.functions.VectorFunctions.zValue(
      array(cols.map(c => col(c).cast("double")): _*), boundaries)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
