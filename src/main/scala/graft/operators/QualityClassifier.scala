package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of an LLM data
  * curation pipeline (the role fastText/logreg quality models play in
  * published corpus builds: score every document against a trained
  * linear model, keep above a threshold).
  *
  * Beyond-parity surface. Training happens OFFLINE (weights arrive as
  * literals); scoring is a pure codegen'd projection — the weighted sum
  * fuses into the scan's whole-stage-codegen span, nothing is shuffled,
  * broadcast, or interpreted per row, so scoring 100 TB costs one pass
  * over the text bytes.
  *
  * The engineered features reuse [[TextAnalysis]]'s portable
  * formulations (plain IEEE arithmetic over int-derived values, no
  * rounding), and the logit is a LEFT-ASSOCIATED weighted sum of them —
  * deterministic operation order, so results are bit-identical across
  * engines computing the same shape (the catalog oracle re-derives it
  * in DuckDB). The sigmoid is deliberately NOT applied: exp() may
  * differ in the last ulp across math libraries, while the logit is
  * exact, monotone in the probability, and thresholds identically.
  */
object QualityClassifier {

  /** A trained linear model: ordered (feature, weight) terms + bias.
    * Order matters — the logit is evaluated left-to-right, and IEEE
    * addition is not associative.
    */
  final case class LinearModel(bias: Double, terms: Seq[(String, Double)]) {
    require(terms.nonEmpty, "model needs at least one term")
    require(terms.map(_._1).distinct.size == terms.size,
      s"duplicate feature in model: ${terms.map(_._1)}")
  }

  /** Feature registry: name -> column expression over the text. */
  def feature(name: String, text: Column): Column = name match {
    case "n_tokens"       => TextAnalysis.tokenCount(text).cast("double")
    case "mean_token_len" => TextAnalysis.meanTokenLen(text)
    case "punct_ratio"    => TextAnalysis.punctRatio(text)
    case "stopword_ratio" => TextAnalysis.stopwordRatio(text)
    case "dup_line_frac"  => TextAnalysis.duplicateLineFraction(text)
    case "top2gram_frac"  => TextAnalysis.topNgramFraction(text, 2)
    case other => throw new IllegalArgumentException(
      s"unknown feature '$other'; known: n_tokens, mean_token_len, " +
        "punct_ratio, stopword_ratio, dup_line_frac, top2gram_frac")
  }

  /** Hand-set demonstration weights (favor longer, low-punctuation,
    * naturally-stopworded text). A real deployment trains these offline
    * and passes its own model.
    */
  val defaultModel: LinearModel = LinearModel(-2.0, Seq(
    "n_tokens" -> 0.02,
    "punct_ratio" -> -10.0,
    "stopword_ratio" -> 5.0,
    "mean_token_len" -> 0.1))

  /** The raw decision value for one text column under `model`. */
  def logit(text: Column, model: LinearModel = defaultModel): Column =
    model.terms.foldLeft(lit(model.bias): Column) {
      case (acc, (name, w)) => acc + lit(w) * feature(name, text)
    }

  /** Append `logit` and `keep` (logit >= threshold) columns. */
  def score(
      df: DataFrame, textCol: String,
      model: LinearModel = defaultModel, threshold: Double = 0.0
  ): DataFrame = {
    require(!df.columns.contains("logit") && !df.columns.contains("keep"),
      "input already has a 'logit' or 'keep' column (reserved by score)")
    val l = logit(col(textCol), model)
    df.withColumn("logit", l).withColumn("keep", l >= threshold)
  }

  /** Only the rows the model keeps (the corpus-filter shape). */
  def filterByQuality(
      df: DataFrame, textCol: String,
      model: LinearModel = defaultModel, threshold: Double = 0.0
  ): DataFrame =
    df.filter(logit(col(textCol), model) >= threshold)
}
