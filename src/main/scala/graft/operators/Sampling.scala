package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling for training-data
  * pipelines (train/val/test splits, per-stratum downsampling).
  *
  * Everything here is a PURE PROJECTION over an id column: no shuffle,
  * no RNG state, no sampling seed to thread through a cluster. The same
  * row lands in the same split on every run, on every engine, at any
  * parallelism — which is what a reproducible training mix needs (a
  * `rand()`-based split changes membership on retry/re-partition, and
  * `df.sample` is seed-deterministic only within one Spark lineage).
  *
  * The bucket hash is a two-word affine mix chosen to be portable: all
  * intermediates stay below 2^63 so engines that ERROR on 64-bit
  * overflow (e.g. DuckDB's BIGINT) compute bit-identical buckets to
  * Spark's wrapping arithmetic — that is what lets the driver
  * oracle-check split membership exactly. It is NOT a cryptographic
  * hash: ids are mixed well enough for splitting (Knuth multiplicative
  * hashing on the low word, a second odd constant on the high word),
  * but an adversarial id distribution should pre-hash with xxhash64
  * (engine-specific, so not oracle-portable).
  */
object Sampling {

  /** Number of hash buckets; fractions are expressed in 1/1000ths. */
  val Buckets = 1000L

  private val LowMask = 0x7fffffffL // low 31 bits
  private val A = 2654435761L // Knuth multiplicative constant (2^32/phi)
  private val B = 40503L      // odd mix for the high word
  private val C = 97531L

  /** Deterministic bucket in [0, Buckets) for a non-null integral id.
    * max intermediate: (2^31-1)*A + (2^32)*B + C < 5.8e18 < 2^63.
    */
  def hashBucket(id: Column): Column = {
    val low = id.bitwiseAND(lit(LowMask))
    val high = shiftright(id, 31).bitwiseAND(lit(LowMask))
    pmod(low * lit(A) + high * lit(B) + lit(C), lit(Buckets))
  }

  /** Split label from cumulative per-mill weights, e.g.
    * `Seq("train" -> 800, "val" -> 100, "test" -> 100)`. Weights must
    * sum to [[Buckets]] so every row gets exactly one label.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(weights.map(_._2).sum == Buckets,
      s"weights must sum to $Buckets per-mill, got ${weights.map(_._2).sum}")
    val b = hashBucket(id)
    val cums = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cums).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cum), rest) => when(b < cum, name).otherwise(rest)
    }
  }

  /** Corpus with a `split` column — the reproducible train/val/test
    * assignment. A filter on `split` stays a codegen'd scan predicate.
    */
  def withSplit(
      df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100)
  ): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), weights))

  /** Deterministic stratified downsample: keep a per-stratum fraction
    * (per-mill) of rows, decided by the id bucket — no shuffle, no RNG,
    * exact membership reproducibility. Strata absent from `fractions`
    * keep `defaultPerMill` (default: dropped).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Int], defaultPerMill: Int = 0
  ): DataFrame = {
    require((defaultPerMill +: fractions.values.toSeq)
      .forall(f => f >= 0 && f <= Buckets),
      s"per-mill fractions must be in [0, $Buckets]")
    val keep = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultPerMill): Column) {
      case ((stratum, perMill), rest) =>
        when(col(stratumCol) === stratum, perMill).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol)) < keep)
  }
}
