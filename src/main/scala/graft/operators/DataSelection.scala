package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-matching data selection for LLM pretraining corpora —
  * the DSIR shape (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): score every raw document by how much it
  * looks like a target (in-domain) sample under a cheap bag-of-words
  * language model, then sample/keep by that importance weight. Beyond-
  * parity surface (the reference validates manufacturing telemetry);
  * the paper's hashed-ngram features degrade gracefully to unigram
  * features on this synthetic corpus where |vocab| is tiny.
  */
object DataSelection {

  /** Per-document importance weights against a target subset of the
    * same frame: for each document `x`, `w(x) = Σ_t n_t(x) · f(r_t)`
    * over its tokens `t`, where `r_t = p̂_target(t) / p̂_raw(t)` with
    * add-one-smoothed unigram estimates (`p̂(t) = (c_t + 1) /
    * (total + V)`, `V` = corpus vocabulary size, raw = the WHOLE input
    * frame, target = the rows matching `isTarget`). `f` is `ln` when
    * `logRatio = true` (the default — the paper's log-likelihood-ratio
    * weight, production resampling feeds `exp(w)` or ranks by `w`
    * directly) and identity when false: the rational variant keeps the
    * same "target-like tokens raise the weight" signal with only
    * correctly-rounded IEEE ops (int-derived divides, multiplies, and
    * a token-sorted deterministic fold), so two engines agree
    * bit-for-bit — the oracle-checked catalog entry pins the rational
    * variant and the `ln` variant is spec-pinned (`ln` differs in
    * final ulps between libm and the JVM; same trade as
    * [[TextAnalysis.tfidf]]).
    *
    * Returns (id, n_tokens, weight); empty/whitespace-only documents
    * get n_tokens = 0 and weight = 0.0.
    *
    * Scale shape: ONE pass builds the joint vocabulary counts (explode
    * → map-side-combined groupBy(token), carrying the target count as
    * a conditional sum — the target subset is never scanned
    * separately); totals are a 1-row broadcast onto the |V|-row ratio
    * table, which broadcasts onto the per-(doc, token) tf frame (AQE:
    * vocab ≪ corpus); the per-document sum is a token-sorted
    * `aggregate` fold — deterministic left-association, buffer bounded
    * by the document's DISTINCT token count, and the oracle replays it
    * with `list(... ORDER BY token)` + `list_reduce`. No corpus-sized
    * state ever sits in one task; at 100 TB the only corpus-wide
    * shuffles are the two map-side-combined token aggs. The explicit
    * ratio-table broadcast is safe under DSIR's own contract: the
    * paper hashes features into a FIXED bucket count (10^4) precisely
    * so the model stays O(1)-sized regardless of corpus scale — on a
    * natural-vocabulary corpus pass tokens through such a hash first
    * (here |V| is structurally tiny, so raw unigrams broadcast as-is).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, logRatio: Boolean = true): DataFrame = {
    val toks = df.select(col(idCol), isTarget.as("is_target"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val vocab = toks.groupBy(col("token")).agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("c_tgt"))
    val totals = vocab.agg(
      sum(col("c_raw")).as("t_raw"), sum(col("c_tgt")).as("t_tgt"),
      count(lit(1)).as("v"))
    val pTgt = (col("c_tgt") + lit(1L)).cast(DoubleType) /
      (col("t_tgt") + col("v")).cast(DoubleType)
    val pRaw = (col("c_raw") + lit(1L)).cast(DoubleType) /
      (col("t_raw") + col("v")).cast(DoubleType)
    val ratio = { val r = pTgt / pRaw; if (logRatio) log(r) else r }
    val ratios = vocab.crossJoin(broadcast(totals))
      .select(col("token"), ratio.as("r"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("n"))
    val weights = tf.join(broadcast(ratios), "token")
      .withColumn("term_w", col("n").cast(DoubleType) * col("r"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        sort_array(collect_list(struct(col("token"), col("term_w")))).as("tw"))
      .withColumn("weight",
        aggregate(col("tw"), lit(0.0), (acc, x) => acc + x.getField("term_w")))
      .select(col(idCol), col("n_tokens"), col("weight"))
    df.select(col(idCol)).join(weights, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }
}
