package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — the classic shuffle-pruning move
  * for selective fact-to-dim joins at 100 TB: when the dim side is too
  * big to broadcast but matches only a sliver of the fact's keys, a
  * plain sort-merge join still shuffles EVERY fact row. Building a
  * compact bloom filter over the dim keys (one distributed aggregate,
  * a few MB for tens of millions of keys at 1% fpp) and filtering the
  * fact at the SCAN — map-side, before the exchange — shrinks the
  * shuffle to ~(selectivity + fpp) of the fact. The exact join then
  * removes the false positives, so results are bit-identical to the
  * unpruned join.
  *
  * Spark's optimizer can inject this automatically (runtime bloom
  * filters, `InjectRuntimeFilter`) when its heuristics fire; this
  * operator makes the reduction EXPLICIT and, more importantly,
  * PERSISTABLE: [[save]]/[[load]] write the filter bytes to a path, so
  * one job can build "the keys that exist" once and every later job —
  * incremental ingest probes, decontamination sweeps, "already
  * indexed?" membership checks — prunes against it without touching
  * the dim data again. That cross-job reuse is the piece the optimizer
  * cannot do.
  *
  * The filter ships to executors as a plan-constant reference object
  * inside a codegen kernel ([[graft.functions.BloomMightContainExpr]]),
  * so probing stays inside whole-stage codegen — no UDF, no join.
  */
object BloomPrune {

  /** Distributed bloom build over `df`'s `keyCol` (long or string).
    * `expectedItems` sizes the bitset; `fpp` is the target false
    * -positive rate at that cardinality (the usual 1% default keeps
    * ~9.6 bits/key).
    */
  def build(
      df: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): BloomFilter =
    df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Membership test column over `bloom` — true possibly, false
    * definitely-absent. Codegen'd kernel call; null keys test false.
    */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    graft.functions.VectorFunctions.bloomMightContain(key, bloom)

  /** `fact` ⋈ `dim` on `factKey = dimKey`, with the fact side
    * bloom-pruned before the join's exchange. Exact: false positives
    * survive the prune but die in the join. `expectedItems` should be
    * ≥ the dim's distinct key count — overshooting wastes bits,
    * undershooting inflates fpp (never correctness).
    */
  def semiJoinReduced(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    val bloom = build(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(fact(factKey), bloom))
      .join(dim, fact(factKey) === dim(dimKey))
  }

  /** Persist the filter's bytes (single small file — MBs, not data). */
  def save(spark: SparkSession, bloom: BloomFilter, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bloom.writeTo(out) finally out.close()
  }

  /** Reload a filter persisted by [[save]]. */
  def load(spark: SparkSession, path: String): BloomFilter = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }
}
