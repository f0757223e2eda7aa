package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("withSplit covers every row with exactly one label; proportions match weights") {
    val split = Sampling.withSplit(docs, "doc_id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    // 500 docs: proportions approximate 800/100/100 per-mill
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
  }

  test("split assignment is deterministic and stable across evaluations") {
    def ids(name: String) = Sampling.withSplit(docs, "doc_id")
      .filter(col("split") === name).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val a = ids("val")
    assert(a == ids("val")) // re-evaluated plan, same membership
    assert(a.nonEmpty)
  }

  test("splitLabel rejects weights that do not sum to 1000") {
    assertThrows[IllegalArgumentException](
      Sampling.splitLabel(col("id"), Seq("a" -> 500, "b" -> 400)))
    assertThrows[IllegalArgumentException](
      Sampling.splitLabel(col("id"), Seq.empty))
  }

  test("stratifiedSample keeps ~the per-stratum fraction, drops unlisted strata") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500, "de" -> 200))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet.subsetOf(Set("en", "de")))
    val enTotal = docs.filter(col("lang") === "en").count().toDouble
    if (enTotal > 50)
      assert(math.abs(byLang.getOrElse("en", 0L) / enTotal - 0.5) < 0.15)
    // sampling is a filter: survivors are a subset of the corpus
    assert(sampled.count() <= docs.count())
  }

  test("bucket hash mixes both id words (high-bit-only differences split)") {
    // ids that differ only above bit 31 must not all share buckets
    val ids = (0L until 64L).map(i => (i << 31) | 7L).toDF("id")
    val buckets = ids.select(Sampling.hashBucket(col("id")).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(buckets.size > 16, s"only ${buckets.size} distinct buckets")
  }

  test("strided id spaces spread over all buckets (no mod-collapse)") {
    // sharded/timestamp-derived ids arrive with large strides; a hash
    // whose bucket is affine in id mod 1000 would collapse stride-1000
    // ids into ONE bucket (100% train, empty val/test)
    for (stride <- Seq(10L, 1000L, 4096L)) {
      val ids = (0L until 5000L).map(_ * stride).toDF("id")
      val buckets = ids.select(Sampling.hashBucket(col("id")).as("b"))
        .collect().map(_.getLong(0)).toSet
      assert(buckets.size > 900,
        s"stride $stride uses only ${buckets.size}/1000 buckets")
    }
  }

  test("withClusterSafeSplit: cluster members share one label; singletons match withSplit") {
    val rows = (1L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters {1,2,3} (root 1) and {5,6} (root 5); 4,7,8 singletons
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "component")
    val got = Sampling.withClusterSafeSplit(rows, "doc_id", comps)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // every cluster member carries the root's id and ONE shared label
    assert(Seq(1L, 2L, 3L).map(got(_)).distinct == Seq((1L, got(1L)._2)))
    assert(Seq(5L, 6L).map(got(_)).distinct == Seq((5L, got(5L)._2)))
    // singletons: cluster_id = own id, label identical to the plain split
    val plain = Sampling.withSplit(rows, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(4L, 7L, 8L).foreach { id =>
      assert(got(id) == ((id, plain(id))))
    }
    // and the shared cluster label is the ROOT's plain-split label — the
    // whole cluster moves to where its root would have gone
    assert(got(2L)._2 == plain(1L) && got(6L)._2 == plain(5L))
  }

  test("sampling composes independently with splitting (distinct salts)") {
    // same-salt decisions are perfectly correlated: a 500-per-mill
    // sample keyed like the train split would contain ONLY train rows
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500, "de" -> 500, "fr" -> 500, "es" -> 500, "zh" -> 500))
    val splits = Sampling.withSplit(sampled, "doc_id")
      .groupBy("split").count().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"),
      s"sample+split produced only $splits — correlated decisions")
  }

  test("sampleToTokenBudget stops at the budget per key, overflowing by at most one doc") {
    val withTok = docs.select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
    val kept = Sampling.sampleToTokenBudget(withTok, "doc_id", "n_tok",
      budgetPerKey = 500L, partitionCol = "lang")
    val perLang = kept.groupBy("lang")
      .agg(sum(col("n_tok")).as("toks"), max(col("n_tok")).as("max_doc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, (total, maxDoc)) =>
      // cutoff semantics: total < budget + the largest kept doc
      assert(total < 500L + maxDoc, s"$lang overshot: $total")
    }
    // deterministic: same call, same membership
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleToTokenBudget(withTok, "doc_id", "n_tok",
      budgetPerKey = 500L, partitionCol = "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("no shuffle in the split projection (scale guard)") {
    val plan = Sampling.withSplit(docs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
