package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination: find training documents that share
  * n-gram shingles with an evaluation/benchmark set, so they can be
  * dropped before training (the standard guard against eval leakage).
  *
  * Plan shape (100 TB corpus, small-to-moderate benchmark): shingle
  * both sides with the same fused kernel as the dedup family → explode
  * the CORPUS shingles → inner-join against the DISTINCT benchmark
  * shingle set → per-doc overlap count. The benchmark side is tiny
  * relative to the corpus (eval sets are thousands of documents, not
  * billions), so Spark broadcasts it and the corpus NEVER shuffles for
  * the join; the only shuffle is the per-doc count aggregation, whose
  * map-side partials reduce each doc to one row per partition before
  * the exchange. Cost is linear in corpus shingles — there is no
  * corpus×benchmark pair term anywhere.
  */
object Contamination {

  /** Per-document overlap stats against the benchmark:
    * (id, n_overlap, n_shingles, overlap_ratio). Documents with no
    * overlapping shingle are ABSENT (inner join) — join the result
    * back or use [[decontaminate]] for the filtered corpus.
    */
  def overlapCounts(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8
  ): DataFrame = {
    val corpusShingles = corpus
      .select(col(idCol).as("id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("shingle"))
      .distinct()
    corpusShingles
      .select(col("id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"))
      .groupBy(col("id"), col("n_shingles"))
      .agg(count(lit(1)).cast(LongType).as("n_overlap"))
      .select(col("id"), col("n_overlap"), col("n_shingles").cast(LongType),
        (col("n_overlap").cast(DoubleType) /
          col("n_shingles").cast(DoubleType)).as("overlap_ratio"))
  }

  /** The corpus with contaminated documents removed: a doc is dropped
    * when it shares at least `minOverlap` distinct n-gram shingles with
    * the benchmark. Anti-join on the flagged id set — the corpus
    * payload never shuffles.
    */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, minOverlap: Long = 1L
  ): DataFrame = {
    val flagged = overlapCounts(corpus, idCol, textCol, benchmark, benchTextCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col("id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] for benchmark suites TOO BIG to broadcast as an
    * exact shingle set (a full eval-suite union at modern scale is
    * billions of distinct shingles; exact broadcast stops fitting long
    * before the corpus does). The benchmark shingles collapse into a
    * [[BloomPrune]] filter — fixed MBs at any benchmark size — and the
    * corpus probes it in a codegen kernel projection: NO join at all,
    * the corpus is scanned once and only the per-doc count aggregation
    * shuffles.
    *
    * Safety direction: a bloom false positive counts a shingle as
    * benchmark-contaminated when it is not, so removal is a SUPERSET of
    * the exact operator's — eval integrity is never compromised; the
    * cost is over-removal bounded by `fpp` per shingle (with
    * `minOverlap` > 1 the FP noise must also clear the threshold).
    * Build the filter once with [[BloomPrune.save]] and reuse it across
    * every training run against the same benchmark suite.
    */
  def decontaminateBloom(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, minOverlap: Long = 1L,
      expectedShingles: Long = 10L * 1000 * 1000, fpp: Double = 0.001
  ): DataFrame = {
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("shingle"))
    val bloom = BloomPrune.build(benchShingles, "shingle", expectedShingles, fpp)
    val flagged = corpus
      .select(col(idCol),
        explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .filter(BloomPrune.mightContain(col("shingle"), bloom))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
