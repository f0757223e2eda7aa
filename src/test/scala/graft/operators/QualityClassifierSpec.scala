package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._
  import QualityClassifier._

  test("logit is the left-associated weighted feature sum (hand-computed golden)") {
    // "the cat sat": n_tok=3, punct=0, stopwords {the}=1/3, mtl=9/3=3
    val expected = ((-2.0 + 0.02 * 3.0) + -10.0 * 0.0) + 5.0 * (1.0 / 3) + 0.1 * 3.0
    val got = Seq("the cat sat").toDF("t")
      .select(logit(col("t"))).collect()(0).getDouble(0)
    assert(got == expected)
  }

  test("score splits the corpus non-vacuously; filterByQuality == keep filter") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scored = score(docs, "text")
    val kept = scored.filter(col("keep")).count()
    assert(kept > 0 && kept < scored.count(), s"degenerate split: $kept kept")
    val direct = filterByQuality(docs, "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val viaScore = scored.filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(direct == viaScore)
  }

  test("punctuation and repetition terms move the logit the right way") {
    val m = LinearModel(0.0, Seq("punct_ratio" -> -10.0, "dup_line_frac" -> -3.0))
    val rows = Seq(
      "clean prose with no noise at all",
      "noisy!!! text??? with;;; punctuation!!!",
      "line\nline\nline\nother")
      .toDF("t").select(logit(col("t"), m)).collect().map(_.getDouble(0))
    assert(rows(0) == 0.0)
    assert(rows(1) < 0.0)
    assert(rows(2) < 0.0) // 2 duplicate lines of 4
  }

  test("unknown features and reserved columns fail loudly") {
    intercept[IllegalArgumentException](feature("embedding_norm", lit("x")))
    intercept[IllegalArgumentException](
      LinearModel(0.0, Seq("n_tokens" -> 1.0, "n_tokens" -> 2.0)))
    intercept[IllegalArgumentException](LinearModel(0.0, Seq.empty))
    val withLogit = Seq(("a", 1.0)).toDF("t", "logit")
    intercept[IllegalArgumentException](score(withLogit, "t"))
  }

  test("scoring plan is a pure projection: no shuffle, no UDF") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = score(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"))
    // "*(n)" node prefixes mark whole-stage-codegen stages in this
    // toString form
    assert(plan.contains("*(1)"), plan)
  }
}
