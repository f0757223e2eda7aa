package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language identification, and document
  * fingerprinting. Beyond-parity surface (the reference validates
  * manufacturing telemetry, not text) — every function here is a pure
  * codegen'd Column expression, so the per-document work fuses into the
  * scan's whole-stage-codegen span and never shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "" || text.isNull, 0).otherwise(size(tokens(text)))

  /** Corpus token-frequency vocabulary: the `k` most frequent
    * whitespace tokens, ties broken by token ascending so the result
    * (including the cut at rank k) is deterministic.
    *
    * Plan shape: explode → hash agg with MAP-SIDE partial counts (each
    * input partition shrinks to its distinct tokens before the one
    * shuffle) → `TakeOrderedAndProject` (per-partition k-row heaps, a
    * single k-row driver reduce) — the vocabulary-building step of a
    * tokenizer-training pipeline, safe at corpus scale because nothing
    * ever materializes the full token multiset.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** BPE merge-pair statistics — the corpus-wide counting step of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
    * `k` most frequent adjacent character pairs, each word's pairs
    * weighted by the word's corpus frequency (the first training
    * iteration's argmax input; production training loops re-run this
    * over the current symbol sequences after each merge). Ties break
    * by pair ascending so the cut at rank `k` is deterministic.
    *
    * Scale shape: the corpus collapses to DISTINCT words first
    * (map-side-combined groupBy — same contract as [[vocabulary]]), so
    * the pair explode runs over the vocabulary, not the token stream:
    * at 100 TB the second stage's input is bounded by |distinct words|
    * regardless of corpus size. Pair extraction is the fused
    * [[charNgrams]] kernel (lowercases internally, code-point
    * indexed); top-k is a `TakeOrderedAndProject`, never a global
    * sort.
    */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(explode(VectorFunctions.charNgrams(col("w"), 2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(k)
  }

  /** BPE-ish subword count: word chunks + standalone punctuation, the
    * usual cheap proxy for LLM token counts (regex `\w+|[^\w\s]`).
    */
  def bpeishTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit("\\w+|[^\\w\\s]")), lit(0))

  /** Real BPE token count with the vendored merge table (see
    * [[graft.functions.BpeVocab]]) — same pretokenization as
    * [[bpeishTokenCount]], then subword merges, so
    * `bpeishTokenCount <= bpeTokenCount <= non-space char count`.
    */
  def bpeTokenCount(text: Column): Column =
    coalesce(graft.functions.BpeFunctions.bpeTokenCount(text), lit(0L))

  /** Fraction of lines that duplicate an earlier line —
    * `(lines - distinct lines) / lines`. The classic boilerplate signal
    * (navigation menus, cookie banners, chat headers repeat verbatim).
    * Built-ins only, so it fuses into the scan's codegen span.
    */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n", -1)
    val nl = size(lines).cast(DoubleType)
    when(text.isNull, 0.0)
      .otherwise((nl - size(array_distinct(lines)).cast(DoubleType)) / nl)
  }

  /** Frequency share of the most common token n-gram (Gopher-style
    * repetition signal; 0 when the document has fewer than n tokens).
    * Native kernel — one fused loop per row, no interpreted lambdas.
    */
  def topNgramFraction(text: Column, n: Int): Column =
    coalesce(VectorFunctions.topNgramFraction(tokens(text), n), lit(0.0))

  /** Fraction of token n-gram occurrences that repeat an earlier one
    * (Gopher's duplicate-n-gram family; 0 when the document has fewer
    * than n tokens). Complements [[topNgramFraction]]: a paragraph
    * pasted twice barely moves the top-gram share but doubles up every
    * n-gram it contains. Native kernel — one fused loop per row.
    */
  def duplicateNgramFraction(text: Column, n: Int): Column =
    coalesce(VectorFunctions.dupNgramFraction(tokens(text), n), lit(0.0))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast(DoubleType)
    when(len === 0 || text.isNull, 0.0)
      .otherwise(regexp_count(text, lit("[\\p{Punct}]")).cast(DoubleType) / len)
  }

  /** Common English stopwords (small fixed set — a literal array kept in
    * codegen, no broadcast needed).
    */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that")

  /** Count of tokens present in a fixed word set (native kernel —
    * hash-set membership, no per-element interpreted lambda).
    */
  def markerHits(toks: Column, words: Seq[String]): Column =
    VectorFunctions.tokenSetCount(toks, words)

  /** Fraction of tokens that are stopwords (duplicates counted). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val toks = tokens(text)
    val n = size(toks).cast(DoubleType)
    when(n === 0 || text.isNull, 0.0).otherwise(
      markerHits(tokens(lower(text)), stopwords).cast(DoubleType) / n)
  }

  /** Mean token length in characters. Native kernel for the sum — an
    * `aggregate` HOF lambda here would be interpreted per element, the
    * 10-100x trap the kernel layer exists to avoid.
    */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0 || text.isNull, 0.0).otherwise(
      VectorFunctions.tokenCharSum(toks).cast(DoubleType) / size(toks))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation noise and a natural stopword rate. Heuristic weights —
    * the shape (cheap per-doc features → weighted sum) is the point.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val lengthScore = least(nTok / 100.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lengthScore * 0.4 + punctScore * 0.4 + stopScore * 0.2, 4)
  }

  /** Gopher-style quality-rule audit (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A — the public rule set
    * most corpus pipelines start from): per-document signal columns,
    * one 0/1 flag per rule, and the conjunction `keep`. Reported
    * per-rule rather than pre-filtered because the audit table IS the
    * deliverable at curation time — you tune thresholds by looking at
    * what each rule rejects before committing to a cut.
    *
    * Rules (each threshold a parameter; Gopher's published defaults):
    *  - `r_token_count`: token count in [minTokens, maxTokens]
    *  - `r_word_len`: mean token length in [minMeanTokLen, maxMeanTokLen]
    *  - `r_repetition`: top-bigram frequency share ≤ maxTop2Frac
    *  - `r_boilerplate`: duplicate-line fraction ≤ maxDupLineFrac
    *  - `r_stopwords`: ≥ minStopHits DISTINCT stopwords present
    * (Gopher's symbol-ratio and alpha-word rules are omitted: the
    * former needs corpus-specific symbol sets, and the latter would
    * put a per-token regex in an interpreted HOF lambda — the codegen
    * trap the kernel layer exists to avoid.)
    *
    * Scale shape: a pure projection over existing fused kernels
    * (tokenCount / meanTokenLen / topNgramFraction /
    * duplicateLineFraction) — no shuffle, no UDF; the stopword check
    * scans the small literal word list per row. Signals are emitted as
    * named columns in a lower projection so each kernel evaluates once
    * per row (CollapseProject keeps non-cheap expressions out of
    * multi-consumer inlining).
    */
  def gopherRules(
      df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
      maxTop2Frac: Double = 0.2, maxDupLineFrac: Double = 0.3,
      stopwords: Seq[String] = stopwordsEn, minStopHits: Int = 2
  ): DataFrame = {
    require(minTokens >= 0 && maxTokens >= minTokens, "bad token bounds")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val txt = col(textCol)
    // distinct stopwords present: iterate the SMALL literal word list,
    // membership-test against the token array — symmetric in DuckDB
    // (len(list_filter(stops, s -> list_contains(toks, s)))), and the
    // interpreted lambda runs |stopwords| times per row, not |tokens|
    val toksLower = tokens(lower(txt))
    val stopArr = array(stopwords.map(lit): _*)
    val stopHits = when(txt.isNull, 0).otherwise(
      size(filter(stopArr, s => array_contains(toksLower, s))))
    val signals = df.select(col(idCol),
      tokenCount(txt).cast(IntegerType).as("n_tokens"),
      meanTokenLen(txt).as("mean_tok_len"),
      topNgramFraction(txt, 2).as("top2_frac"),
      duplicateLineFraction(txt).as("dup_line_frac"),
      stopHits.cast(IntegerType).as("stop_hits"))
    val flag = (c: Column) => when(c, 1).otherwise(0)
    signals.select(col(idCol),
        col("n_tokens"), col("mean_tok_len"), col("top2_frac"),
        col("dup_line_frac"), col("stop_hits"),
        flag(col("n_tokens").between(minTokens, maxTokens)).as("r_token_count"),
        flag(col("mean_tok_len").between(minMeanTokLen, maxMeanTokLen)).as("r_word_len"),
        flag(col("top2_frac") <= maxTop2Frac).as("r_repetition"),
        flag(col("dup_line_frac") <= maxDupLineFrac).as("r_boilerplate"),
        flag(col("stop_hits") >= minStopHits).as("r_stopwords"))
      .withColumn("keep",
        col("r_token_count") * col("r_word_len") * col("r_repetition")
          * col("r_boilerplate") * col("r_stopwords"))
  }

  /** Tiny per-language marker-word sets for the n-gram/stopword
    * language-ID heuristic.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "que", "por", "con")
  )

  /** Heuristic language ID: argmax over per-language marker-token hit
    * counts; "und" (undetermined) when nothing matches. One pass over
    * the token array per language — all codegen'd.
    */
  def langId(text: Column, markers: Map[String, Seq[String]] = langMarkers): Column = {
    val toks = tokens(lower(text))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(markerHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Term-frequency frame: one row per (document, token) with the
    * in-document count. The explode never materializes per-document
    * token multisets across rows — map-side partial counts shrink each
    * input partition to its distinct (doc, token) pairs before the one
    * shuffle.
    */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF scores, all (document, token) pairs. Two idf variants:
    *
    *   - `logIdf = true` (default, classic): `tf * ln((N+1)/(df+1))`
    *     (smoothed) — use this in production ranking pipelines.
    *   - `logIdf = false` (rational): `tf * (N+1)/(df+1)` — same
    *     monotone-decreasing dependence on document frequency, but the
    *     score is ONE integer-exact multiply and ONE IEEE division, both
    *     correctly rounded, so two independent engines agree
    *     bit-for-bit. `ln` carries no such guarantee (libm vs
    *     `Math.log` differ in final ulps), which is why the
    *     oracle-checked catalog entry pins this variant. Note the
    *     rational idf stretches the idf range, so top-k SETS can differ
    *     between variants when tf differences fight idf differences.
    *
    * Plan shape: [[termFrequencies]] (1 shuffle, map-side combined) →
    * token-keyed doc-frequency agg (2nd shuffle, #tokens rows) → join
    * back on token (AQE broadcasts the vocab side when it fits) → a
    * single-row corpus-count broadcast (never a global window). Nothing
    * in the plan holds per-document or per-corpus state in one task.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      logIdf: Boolean = true): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol)
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val idf = {
      val ratio = (col("n_docs") + lit(1L)).cast(DoubleType) /
        (col("df") + lit(1L)).cast(DoubleType)
      if (logIdf) log(ratio) else ratio
    }
    tf.join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast(DoubleType) * idf)
      .drop("n_docs")
  }

  /** Top-`k` TF-IDF terms per document (rank + deterministic token
    * tie-break). The per-document window rides the third shuffle, keyed
    * by the document id — per-key state only, and the rank filter is
    * pushed into the sort as a `WindowGroupLimit`, so no task ever holds
    * more than a k-row heap per document.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
      logIdf: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    tfidf(df, idCol, textCol, logIdf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Okapi BM25 document retrieval for a bag-of-words query (Robertson
    * & Walker; the BM25 used by Lucene/Elasticsearch): the `k`
    * best-scoring documents, ties broken by document id ascending.
    * Returns (id, hits, score) where `hits` is the total query-term
    * occurrence count in the document.
    *
    * Two idf variants (same trade as [[tfidf]]):
    *
    *   - `logIdf = true` (default, classic): `ln(1 + (N-df+0.5)/(df+0.5))`
    *     — production ranking.
    *   - `logIdf = false` (rational): `(N-df+0.5)/(df+0.5)` — the same
    *     monotone dependence on document frequency but only
    *     correctly-rounded IEEE ops (int-derived adds, multiplies,
    *     divides), so two engines agree bit-for-bit; the oracle-checked
    *     catalog entry pins this variant and the classic one is
    *     spec-pinned.
    *
    * The per-document score is a SUM of per-term floats — IEEE addition
    * is not associative, so a plain float `sum()` aggregate would be
    * partial-merge-order nondeterministic. The sum instead rides a
    * token-sorted fold (`sort_array(collect_list(...))` + `aggregate`):
    * deterministic left-association in token order, replayable by the
    * oracle (`list(... ORDER BY token)` + `list_reduce`). The buffer is
    * bounded by |query terms| per document — never the document's full
    * token multiset.
    *
    * Scale shape: the token stream filters to the query terms BEFORE
    * the tf shuffle (shuffled volume ∝ query-term hits, not corpus
    * tokens); document frequency is a |terms|-row broadcast; corpus
    * stats (N, total tokens for avgdl) are a 1-row broadcast; lengths
    * ride a co-keyed join with the tf frame; the final top-k is a
    * `TakeOrderedAndProject` (per-partition k-row heaps), never a
    * global sort.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    // ONE tokenize pass feeds tf, dl and df: the doc length rides the
    // projection through the explode (constant per doc, so adding it
    // to the group key changes nothing), and the per-token document
    // frequency is a COUNT window over the term-matched tf frame
    // (≪ corpus rows) instead of a second agg whose reference
    // re-evaluated the whole tokenize subtree. The previous four
    // corpus scans (lens join + global stats + tf + dfreq) are now
    // two — the global (n_docs, total_tokens) scalar still needs its
    // own full pass.
    val stats = df.agg(count(lit(1)).as("n_docs"),
      sum(tokenCount(lower(col(textCol))).cast(LongType)).as("total_tokens"))
    val tf = df.select(col(idCol),
        tokenCount(lower(col(textCol))).cast(LongType).as("dl"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token").isInCollection(terms))
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
    val idfRatio = ((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + idfRatio) else idfRatio
    val avgdl = col("total_tokens").cast(DoubleType) / col("n_docs").cast(DoubleType)
    val norm = lit(1.0 - b) + lit(b) * (col("dl").cast(DoubleType) / avgdl)
    val termScore = idf * ((col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
      (col("tf").cast(DoubleType) + lit(k1) * norm))
    tf
      .crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("hits"),
        sort_array(collect_list(struct(col("token"), col("term_score")))).as("ts"))
      .withColumn("score",
        aggregate(col("ts"), lit(0.0), (acc, x) => acc + x.getField("term_score")))
      .select(col(idCol), col("hits"), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Corpus n-gram novelty: per document, the fraction of its DISTINCT
    * token `n`-grams that appear in no other document — the inverse of
    * the cross-doc boilerplate signal (a near-1 novelty means original
    * text; near-0 means the document is stitched from corpus-common
    * n-grams). Returns (id, n_grams, n_novel, novelty); documents with
    * fewer than `n` tokens have no grams and get (0, 0, 0.0).
    *
    * The novelty ratio is one int/int IEEE division — hash-exact
    * cross-engine (the same contract as the Gopher signals).
    *
    * Scale shape: the gram stream is per-doc-deduplicated at the source
    * (the [[Dedup.shingles]] kernel), so volume is bounded by distinct
    * grams per doc; document frequency is a map-side-combined
    * groupBy(gram); the join back to the gram stream shares the same
    * gram-key shuffle (no second corpus pass), and the final per-doc
    * agg is the only id-keyed shuffle. No all-pairs comparison
    * anywhere — this is the linear-cost complement to the quadratic
    * pair-graph operators.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val grams = df.select(col(idCol),
      explode(graft.functions.VectorFunctions.shingles(col(textCol), n)).as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val stats = grams.join(dfreq, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(DoubleType) / col("n_grams").cast(DoubleType))
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("novelty"), lit(0.0)).as("novelty"))
  }

  /** Document-level token co-occurrence association: the `k` unordered
    * token pairs most associated by LIFT — `P(a,b) / (P(a)·P(b))` over
    * document membership (the church-hanks PMI statistic without the
    * final log; `PMI = ln(lift)`, and since `ln` is monotone the
    * ranking is identical while the rational lift is hash-exact:
    * integer products under 2^53 and ONE IEEE division — the same
    * trade as [[tfidf]]'s rational idf; the log form is spec-pinned).
    * Pairs below `minCount` co-occurring documents are cut before
    * ranking (rare-pair lift explodes, the classic PMI pathology);
    * ties break (lift desc, pair asc) so the cut at `k` is
    * deterministic. Returns (token_a, token_b, n_ab, n_a, n_b, lift),
    * token_a < token_b.
    *
    * Scale shape: the corpus collapses to DISTINCT (doc, token) first
    * (map-side combined); the per-doc self-join is bounded by each
    * document's token-SET size squared, and its output collapses
    * map-side to distinct pairs before the one pair-keyed shuffle;
    * token document-counts are a |vocab|-row broadcast; N is a 1-row
    * broadcast; top-k is a `TakeOrderedAndProject`. At natural-corpus
    * scale, prune the token stream to a top-V vocabulary broadcast
    * BEFORE the self-join (the standard practice) — the synthetic
    * vocabulary is structurally tiny so no prune is wired here.
    */
  def cooccurrenceLift(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long, logPmi: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val docTok = df.select(col(idCol).as("__id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val tokCounts = docTok.groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val pairs = docTok.as("l")
      .join(docTok.as("r"), col("l.__id") === col("r.__id") &&
        col("l.token") < col("r.token"))
      .groupBy(col("l.token").as("token_a"), col("r.token").as("token_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val lift = (col("n_ab").cast(DoubleType) * col("n_docs").cast(DoubleType)) /
      (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType))
    // attach n_a and n_b with ONE reference to tokCounts: the two-join
    // form (join on token_a, join on token_b) referenced the
    // tokenize+distinct+agg subtree twice and Catalyst evaluated the
    // corpus pass once per reference (r18 plan audit: 4 corpus
    // tokenize scans for the whole operator). Each pair row explodes
    // into its two (side, token) probes, joins the count table once,
    // and folds back — pair-bounded rows throughout, corpus passes
    // 4 → 3 (the self-join's two sides are the irreducible rest).
    val withCounts = pairs
      .select(col("token_a"), col("token_b"), col("n_ab"),
        posexplode(array(
          struct(lit("a").as("side"), col("token_a").as("token")),
          struct(lit("b").as("side"), col("token_b").as("token")))))
      .select(col("token_a"), col("token_b"), col("n_ab"),
        col("col.side").as("__side"), col("col.token").as("token"))
      .join(broadcast(tokCounts), "token")
      .groupBy(col("token_a"), col("token_b"), col("n_ab"))
      .agg(max(when(col("__side") === "a", col("n_tok"))).as("n_a"),
        max(when(col("__side") === "b", col("n_tok"))).as("n_b"))
    withCounts
      .crossJoin(broadcast(nDocs))
      .withColumn("lift", if (logPmi) log(lift) else lift)
      .select(col("token_a"), col("token_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift"))
      .orderBy(col("lift").desc, col("token_a").asc, col("token_b").asc)
      .limit(k)
  }

  /** Order-sensitive 64-bit document fingerprint: polynomial rolling hash
    * over token xxhash64s (native kernel — one fused loop per row,
    * values bit-identical to the previous HOF formulation). Equal
    * fingerprints ⇒ equal token sequences (mod collisions) — cheap
    * exact-dup key that ignores whitespace differences.
    */
  def fingerprint(text: Column): Column =
    VectorFunctions.fingerprint64(tokens(text))

  /** Fixed-size token windows with stride — the embedding-pipeline
    * chunking step (RAG windows, long-document encoder input). Returns
    * (id, chunk_idx, chunk_text, n_chunk_tokens): chunks of `size`
    * tokens starting every `stride` tokens (overlap = size - stride
    * when stride < size), the last chunk being the one that reaches the
    * final token — chunk count is exactly 1 + ceil(max(0, m-size)/stride)
    * for m tokens, so the whole frame is deterministic integer/string
    * work a SQL oracle replays. Empty/whitespace-only docs yield no
    * rows.
    *
    * Scale shape: one fused kernel projection
    * ([[graft.functions.ChunkTokensExpr]]) + posexplode — no shuffle,
    * no join; output volume is input tokens × (size/stride) overlap
    * factor, the price of the overlap itself.
    */
  def chunkWindows(
      df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.VectorFunctions
          .chunkTokens(col(textCol), size, stride)))
      .select(col(idCol),
        col("pos").cast(IntegerType).as("chunk_idx"),
        col("col").as("chunk_text"),
        tokenCount(col("col")).cast(IntegerType).as("n_chunk_tokens"))

  /** Flesch–Kincaid-style readability signals — the grade-level
    * screen corpus curation uses to band text by complexity (pairs
    * with [[gopherRules]]' structural cuts and the perplexity bands:
    * a grade far outside the 1..16 range usually means tables,
    * boilerplate, or word salad rather than prose). Sentences are
    * terminal-punctuation runs `[.!?]+`; syllables use the standard
    * cheap proxy (vowel-group runs `[aeiouyAEIOUY]+` — whitespace and
    * consonants both break a run, so counting over the whole text
    * equals summing per word). Output: idCol, `n_words`,
    * `n_sentences`, `n_syllables`, `fk_grade`.
    *
    * `fk_grade` = 0.39·(words/sentences) + 11.8·(syllables/words)
    * − 15.59 with both denominators clamped to ≥ 1 (a fragment with
    * no terminal punctuation is one sentence; an empty doc scores the
    * constant floor instead of NaN). The arithmetic is bare IEEE
    * doubles in a fixed evaluation order — bit-identical across
    * engines, so the frame is hash-exact WITHOUT rounding (the
    * round-vs-tie-break trap the verify notes document).
    *
    * Pure codegen'd projection — three regex counters and a division,
    * no shuffle, no UDF; scans stay whole-stage at any corpus size.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = tokenCount(col(textCol)).cast(LongType)
    val s = regexp_count(col(textCol), lit("[.!?]+")).cast(LongType)
    val sy = regexp_count(col(textCol), lit("[aeiouyAEIOUY]+")).cast(LongType)
    val wD = w.cast(DoubleType)
    val sEff = greatest(lit(1L), s).cast(DoubleType)
    val wEff = greatest(lit(1L), w).cast(DoubleType)
    df.select(col(idCol),
      w.as("n_words"), s.as("n_sentences"), sy.as("n_syllables"),
      (lit(0.39) * (wD / sEff) + lit(11.8) * (sy.cast(DoubleType) / wEff)
        - lit(15.59)).as("fk_grade"))
  }

  /** Per-document feature frame: the standard text-quality projection. */
  def documentFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeishTokenCount(col(textCol)).as("n_bpeish_tokens"),
      length(col(textCol)).as("n_chars"),
      round(meanTokenLen(col(textCol)), 4).as("mean_token_len"),
      round(punctRatio(col(textCol)), 4).as("punct_ratio"),
      round(stopwordRatio(col(textCol)), 4).as("stopword_ratio"),
      qualityScore(col(textCol)).as("quality_score"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"))
}
