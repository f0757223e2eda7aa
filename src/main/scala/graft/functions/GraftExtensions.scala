package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** Registers the graft kernel expressions as SQL functions, so the
  * engine's custom operators are first-class in `spark.sql(...)` too:
  *
  * {{{
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * Two activation paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - explicit: `GraftExtensions.register(spark)` on a live session.
  *
  * Literal int/string args are extracted at resolution time (the
  * kernel parameters are plan-time constants, like Spark's own
  * `array_repeat` count).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def stringSeqArg(e: Expression, what: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
      children.map {
        case Literal(s: UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$what elements must be string literals, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be an array(...) of string literals, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(
      classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "",
      /* group */ "misc_funcs", /* since */ "1.0.0", /* deprecated */ "",
      /* source */ "built-in")

  /** Wraps a builder with an exact-arity check so a missing/extra SQL
    * argument fails at analysis time with the function name, not as an
    * executor-side IndexOutOfBoundsException.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")
      build(args)
    }

  /** (name, info, builder) triples for every registered function. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "dot product of two numeric arrays"),
      arity("graft_dot", 2)(args => DotProductExpr(args(0), args(1)))),
    ("graft_cosine", info("graft_cosine", "cosine similarity of two numeric arrays"),
      arity("graft_cosine", 2)(args => CosineSimilarityExpr(args(0), args(1)))),
    ("graft_simhash", info("graft_simhash", "64-bit simhash of a token array"),
      arity("graft_simhash", 1)(args => SimHash64Expr(args(0)))),
    ("graft_shingles", info("graft_shingles", "token n-gram shingles of a text value"),
      arity("graft_shingles", 2)(args => ShinglesExpr(args(0), intArg(args(1), "n")))),
    ("graft_minhash_sig", info("graft_minhash_sig", "minhash signature of a shingle array"),
      arity("graft_minhash_sig", 2)(args =>
        MinHashSignatureExpr(args(0), intArg(args(1), "numHashes")))),
    ("graft_minhash_bands", info("graft_minhash_bands", "fused minhash+LSH band buckets"),
      arity("graft_minhash_bands", 3)(args => MinHashBandsExpr(args(0),
        intArg(args(1), "numHashes"), intArg(args(2), "bands")))),
    ("graft_sign_bucket", info("graft_sign_bucket", "hyperplane-LSH sign bucket of a vector"),
      arity("graft_sign_bucket", 3)(args => SignBucketExpr(args(0),
        intArg(args(1), "planes"), longArg(args(2), "seed")))),
    ("graft_token_set_count", info("graft_token_set_count", "count of tokens in a literal word set"),
      arity("graft_token_set_count", 2)(args =>
        TokenSetCountExpr(args(0), stringSeqArg(args(1), "words")))),
    ("graft_jaccard", info("graft_jaccard", "exact jaccard similarity of two string arrays"),
      arity("graft_jaccard", 2)(args => JaccardExpr(args(0), args(1)))),
    ("graft_fingerprint", info("graft_fingerprint", "rolling 64-bit fingerprint of a token array"),
      arity("graft_fingerprint", 1)(args => Fingerprint64Expr(args(0)))),
    ("graft_token_char_sum", info("graft_token_char_sum", "total characters across a token array"),
      arity("graft_token_char_sum", 1)(args => TokenCharSumExpr(args(0)))),
    ("graft_bpe_count", info("graft_bpe_count", "BPE token count with the vendored merge table"),
      arity("graft_bpe_count", 1)(args => BpeCountExpr(args(0)))),
    ("graft_top_ngram_fraction",
      info("graft_top_ngram_fraction", "frequency share of the most common token n-gram"),
      arity("graft_top_ngram_fraction", 2)(args =>
        TopNgramFractionExpr(args(0), intArg(args(1), "n")))),
    ("graft_dot_long",
      info("graft_dot_long", "exact integer dot product of two bigint arrays"),
      arity("graft_dot_long", 2)(args => DotLongExpr(args(0), args(1)))),
    ("graft_dup_ngram_fraction",
      info("graft_dup_ngram_fraction", "fraction of token n-gram occurrences that repeat"),
      arity("graft_dup_ngram_fraction", 2)(args =>
        DupNgramFractionExpr(args(0), intArg(args(1), "n")))),
    ("graft_char_ngrams",
      info("graft_char_ngrams", "sliding character n-grams of lower(text)"),
      arity("graft_char_ngrams", 2)(args =>
        CharNgramsExpr(args(0), intArg(args(1), "n")))),
    ("graft_normalize_text",
      info("graft_normalize_text", "NFC + control scrub + whitespace-collapse text normalization"),
      arity("graft_normalize_text", 1)(args => NormalizeTextExpr(args(0)))),
    ("graft_chunk_tokens",
      info("graft_chunk_tokens", "fixed-size token windows with stride over a text value"),
      arity("graft_chunk_tokens", 3)(args =>
        ChunkTokensExpr(args(0), intArg(args(1), "size"), intArg(args(2), "stride"))))
  )

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), fnInfo, builder)
    }
}
