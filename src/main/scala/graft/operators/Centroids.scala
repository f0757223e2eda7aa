package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group-wise embedding centroids — the aggregation half of k-means and
  * the building block for per-cluster / per-language corpus statistics
  * over an embedding column.
  *
  * Plan shape (the part that matters at 100 TB): `posexplode` fans each
  * vector into (key, pos, x) rows, and the (key, pos) hash aggregation
  * partial-combines on the map side — each input partition shrinks to
  * (#keys × dim) rows before the one shuffle, so shuffle volume is
  * bounded by parallelism × keys × dim, never by corpus size. The final
  * per-key assembly collects dim elements per key (a bounded
  * `collect_list`: the vector dimension, validated upstream, not data
  * volume). No task ever holds more than one group's dim-length buffer.
  */
object Centroids {

  /** Element-wise mean vector per group: (key, n, centroid).
    * `n` is the group's vector count; rows with a null/empty vector are
    * excluded. Dimensions are assumed uniform per group (the caller
    * validates, as [[Ivf.buildIndex]] does) — with ragged input each
    * position averages over the vectors that have it.
    */
  def groupCentroids(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    sumsPerPosition(df, keyCol, vecCol)
      .groupBy(col("__k"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__sx"), col("__n")))),
          s => s.getField("__sx") / s.getField("__n").cast(DoubleType)
        ).as("centroid"),
        max(col("__n")).as("n"))
      .select(col("__k").as(keyCol), col("n"), col("centroid"))

  /** The exact-arithmetic inner stage: per (key, position) sums and
    * counts, keyed for the one map-side-combined shuffle. Exposed so
    * integer-exact variants (e.g. int8-quantized sums, which two
    * engines can compare bit-for-bit) can reuse the same plan.
    */
  def sumsPerPosition(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(keyCol).as("__k"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .groupBy(col("__k"), col("__pos"))
      .agg(sum(col("__x")).as("__sx"), count(lit(1)).as("__n"))

  /** L2-normalize a vector column (null/zero vectors pass through
    * unchanged — a zero vector has no direction to keep).
    */
  def l2Normalize(vec: Column): Column = {
    val norm = sqrt(graft.functions.VectorFunctions.dot(vec, vec))
    when(vec.isNull || norm === 0.0 || norm.isNaN, vec)
      .otherwise(transform(vec, x => x.cast(DoubleType) / norm))
  }
}
