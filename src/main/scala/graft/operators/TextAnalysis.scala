package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Order-sensitive 64-bit document fingerprint: polynomial rolling hash
    * over token xxhash64s (native kernel — one fused loop per row,
    * values bit-identical to the previous HOF formulation). Equal
    * fingerprints ⇒ equal token sequences (mod collisions) — cheap
    * exact-dup key that ignores whitespace differences.
    */
  def fingerprint(text: Column): Column =
    VectorFunctions.fingerprint64(tokens(text))

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
