package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Character n-gram language-model quality scoring — the CCNet-style
  * corpus filter (Wenzek et al. 2020, "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data"): train per-language
  * character n-gram statistics on the corpus itself, then score each
  * document by how typical its character n-grams are. Documents full of
  * rare n-grams (lorem-ipsum noise, encoding garbage, wrong-language
  * text under a language tag) score low and can be filtered or
  * bucketed, exactly like CCNet's perplexity heads/tails.
  *
  * Scoring is deliberately RATIONAL, not log-probability: a document's
  * score is (sum of its n-grams' corpus counts) / (its n-gram count) —
  * exact 64-bit integer aggregates with ONE final IEEE division, so the
  * double is bit-reproducible across engines and the catalog entry can
  * hash-match a DuckDB oracle (same reasoning as the rational-idf
  * variant in [[TextAnalysis.tfidf]]; ln() ulps differ between libm and
  * the JVM). Monotonicity in "typicality" is what filtering needs, and
  * average-corpus-frequency has the same ordering intent as negated
  * perplexity without the float hazard.
  *
  * Scale shape (100 TB): the model build is one map-side-combined
  * hash aggregate over (lang, ngram) — the distinct character-n-gram
  * universe is tiny relative to the corpus — followed by a per-language
  * window over the already-aggregated counts to keep the top `vocab`
  * n-grams. Scoring re-scans the corpus once: explode → BROADCAST hash
  * join against the (<= langs * vocab row) model — the stream is never
  * shuffled for the join — then a partial-aggregated groupBy(doc) whose
  * shuffle is ~1 row per document. No driver-side iteration anywhere.
  */
object NgramLm {

  /** Character n-grams of lower(text), order-preserving; empty array
    * when the text is shorter than n. Pure codegen'd SQL functions
    * (sequence/transform/substr) — stays inside whole-stage codegen.
    */
  def charNgrams(text: Column, n: Int): Column = {
    val lowered = lower(text)
    when(length(lowered) >= n,
      transform(sequence(lit(1), length(lowered) - lit(n - 1)),
        i => substr(lowered, i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Per-language top-`vocab` character n-gram counts: columns `lang`,
    * `tg`, `tg_cnt`. Deterministic at the vocab boundary (count desc,
    * n-gram asc tie-break).
    */
  def trainModel(
      docs: DataFrame,
      langCol: String,
      textCol: String,
      n: Int = 3,
      vocab: Int = 500
  ): DataFrame = {
    val counts = docs
      .select(col(langCol).as("lang"), explode(charNgrams(col(textCol), n)).as("tg"))
      .groupBy(col("lang"), col("tg"))
      .agg(count(lit(1)).as("tg_cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("tg_cnt").desc, col("tg").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= vocab)
      .drop("rn")
  }

  /** Score every document against `model` (from [[trainModel]] — or a
    * persisted copy trained on a reference corpus, the usual CCNet
    * deployment). Columns: id column (caller's name kept), `lm_score`.
    * Documents shorter than n score 0.0 (no n-grams, maximally
    * atypical), as do documents of purely out-of-vocab n-grams.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      model: DataFrame,
      n: Int = 3
  ): DataFrame = {
    // explode_outer keeps zero-ngram docs as a single null-tg row, so
    // every input doc appears in the output without a re-join
    val tri = docs.select(col(idCol), col(langCol).as("lang"),
      explode_outer(charNgrams(col(textCol), n)).as("tg"))
    tri
      .join(broadcast(model), Seq("lang", "tg"), "left")
      .groupBy(col(idCol))
      .agg(
        when(count(col("tg")) > 0,
          sum(coalesce(col("tg_cnt"), lit(0L))).cast(DoubleType) /
            count(col("tg")).cast(DoubleType))
          .otherwise(lit(0.0)).as("lm_score"))
  }
}
