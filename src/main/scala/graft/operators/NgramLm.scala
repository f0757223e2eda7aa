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
  * n-grams. Scoring is a PURE PROJECTION: the model (bounded at langs ×
  * vocab entries by the train-time cap — a few MB) ships to executors
  * as a plan-constant nested hash map inside a codegen kernel
  * ([[graft.functions.NgramModelSumExpr]], the NearestCentroidsExpr
  * pattern), so each doc costs one fused O(ngrams) loop with O(1)
  * lookups — no join, no shuffle, no explode, and the corpus stream is
  * scanned once. The model collect is the one bounded driver action
  * (like Ivf's centroid collect); CCNet's deployment shape is the same
  * — a pretrained model artifact applied to the stream.
  */
object NgramLm {

  /** Collected-model cache keyed by the model frame's CANONICALIZED
    * logical plan: repeated scoring against the same model (the bench
    * reps, or a production job scoring many corpus slices against one
    * reference model) must not re-run the model aggregation and
    * re-collect per call — r9 measured the per-call collect as the
    * dominant cost of `x_lm_score` (2.7 s steady for a pure
    * projection). Canonicalization normalizes ExprIds, and Spark's
    * `InMemoryFileIndex`/`HadoopFsRelation` compare by root paths, so
    * two independent `trainModel(spark.read.parquet(p), ...)` frames
    * over the same files share one entry. The cache assumes the
    * standard Spark immutable-input contract (overwriting the files
    * behind a cached plan mid-session is already undefined behavior for
    * any cached Dataset); each value is bounded at langs × vocab
    * entries, and the map is cleared when it exceeds
    * [[modelCacheMax]] frames so a model-sweep job cannot leak.
    */
  private val modelCacheMax = 8
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]]

  private[graft] def modelCacheSize: Int = modelCache.size()

  private def collectModel(model: DataFrame): java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String,
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]] = {
    import org.apache.spark.unsafe.types.UTF8String
    val byLang =
      new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]
    model.select(col("lang"), col("tg"), col("tg_cnt")).collect().foreach { r =>
      val lang = UTF8String.fromString(r.getString(0))
      var m = byLang.get(lang)
      if (m == null) {
        m = new java.util.HashMap[UTF8String, java.lang.Long]
        byLang.put(lang, m)
      }
      m.put(UTF8String.fromString(r.getString(1)), java.lang.Long.valueOf(r.getLong(2)))
    }
    byLang
  }

  /** Character n-grams of lower(text), order-preserving; empty array
    * when the text is shorter than n. A fused codegen kernel
    * ([[graft.functions.CharNgramsExpr]]) — the equivalent
    * sequence/transform/substr chain evaluates its lambda interpreted
    * per element and measured ~3× slower over the corpus.
    */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.VectorFunctions.charNgrams(text, n)

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
    *
    * Scoring is a PURE PROJECTION via the [[graft.functions
    * .NgramModelSumExpr]] kernel — see the object doc for the scale
    * shape and why the naive map-column/HOF formulations are slow.
    * The model frame is collected driver-side ONCE per distinct model
    * plan (see [[modelCache]]): bounded by langs × `vocab` when it
    * comes from [[trainModel]]; callers supplying a custom model frame
    * own that bound.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      model: DataFrame,
      n: Int = 3,
      keep: Seq[String] = Nil
  ): DataFrame = {
    if (modelCache.size() >= modelCacheMax) modelCache.clear()
    val byLang = modelCache.computeIfAbsent(
      model.queryExecution.analyzed.canonicalized, _ => collectModel(model))
    val tgs = col("__tgs")
    val keepCols = keep.map(col)
    docs
      .select(col(idCol) +: col(langCol).as("__lang")
        +: charNgrams(col(textCol), n).as("__tgs") +: keepCols: _*)
      .select(col(idCol) +:
        coalesce(
          when(size(tgs) > 0,
            graft.functions.VectorFunctions
              .ngramModelSum(tgs, col("__lang"), byLang)
              .cast(DoubleType) / size(tgs).cast(DoubleType))
            .otherwise(lit(0.0)),
          lit(0.0)).as("lm_score") +: keepCols: _*)
  }

  /** CCNet-style per-language quality banding (Wenzek et al. 2020):
    * score every document against the reference model, cut each
    * language at its own score TERCILES, and label head / middle /
    * tail — the bucketing CCNet uses to keep the head (and optionally
    * middle) of each language's quality distribution, so high-resource
    * languages cannot crowd out low-resource ones through a global
    * threshold.
    *
    * Two-pass production shape: a per-language aggregate computes the
    * 1/3 and 2/3 score quantiles (|langs| rows), which broadcast back
    * onto the scored stream as a CASE projection — the corpus never
    * sorts and never funnels through per-language window tasks (a
    * `ntile` over `partitionBy(lang)` would serialize each language
    * through ONE task — the unpartitioned-window anti-pattern in
    * per-group form, a non-starter when one language is a double-digit
    * share of 100 TB). Exact `percentile` keeps the cut
    * oracle-replayable (DuckDB `quantile_cont` — both engines compute
    * the type-7 linear interpolation); its aggregation buffer holds a
    * language's distinct score multiset, so at extreme scale swap in
    * `approx_percentile` with the same downstream shape.
    *
    * Band semantics: `lm_score >= q(2/3)` → head; `>= q(1/3)` →
    * middle; else tail. Ties land in the higher band on both engines
    * (>= against an interpolated-between-equal-values cut).
    */
  def qualityBuckets(
      docs: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      model: DataFrame,
      n: Int = 3
  ): DataFrame = {
    // Score ONCE: the trigram-scoring kernel pass feeds both the cut
    // computation and the banded output — lazily localCheckpoint the
    // 3-column projection so the selector's narrowing passes and the
    // final join read a materialized frame instead of re-running the
    // kernel over the corpus (one pair-bounded copy persists per call,
    // the pageRankInt retention contract).
    val scored = score(docs, idCol, langCol, textCol, model, n, keep = Seq(langCol))
      .localCheckpoint(false)
    // Tercile cuts as TRUE ORDER STATISTICS (rank ceil(q·n) per lang)
    // via the histogram-narrowing selector: ≤ buckets-row driver state
    // per pass — never a per-group value buffer. The previous
    // percentile() aggregate held EVERY group's values in executor
    // memory at once (interpolation needs the sorted array), the
    // unbounded-state pattern that OOMs a hot language at corpus
    // scale; the order-statistic cut is an equally valid tercile and
    // stays bounded. BOTH cuts narrow in the same selector loop
    // (groupedExactQuantiles' multi-q simultaneity) — one set of
    // passes over the scored frame, not one per tercile — then pivot
    // to a |langs|-row (lo, hi) cut table.
    val cuts = broadcast(
      Quantiles.groupedExactQuantiles(
          scored, langCol, "lm_score", Seq(1.0 / 3, 2.0 / 3))
        .groupBy(col(langCol))
        .agg(max(when(col("q") === 2.0 / 3, col("value"))).as("__q_hi"),
          max(when(col("q") === 1.0 / 3, col("value"))).as("__q_lo")))
    // LEFT join: a language whose scores are all null/NaN has no cut
    // rows; its documents must still band (null cuts fail both >=
    // comparisons and fall through to 'tail', the pre-selector
    // keep-all-rows behavior) rather than silently drop.
    scored.join(cuts, Seq(langCol), "left")
      .withColumn("quality_band",
        when(col("lm_score") >= col("__q_hi"), "head")
          .when(col("lm_score") >= col("__q_lo"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col(langCol), col("lm_score"), col("quality_band"))
  }
}
