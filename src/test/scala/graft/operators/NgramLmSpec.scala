package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the log"),
    (3L, "en", "zzqqxx"), // rare-trigram junk under the en tag
    (4L, "en", "ab"), // shorter than n: zero trigrams
    (5L, "de", "der hund und der mond")
  ).toDF("doc_id", "lang", "text")

  test("charNgrams slides over lowered text and handles short strings") {
    val got = docs.select(col("doc_id"), NgramLm.charNgrams(col("text"), 3).as("tg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(4L) == Seq.empty)
    assert(got(3L) == Seq("zzq", "zqq", "qqx", "qxx"))
    assert(got(1L).take(3) == Seq("the", "he ", "e c"))
    assert(got(1L).size == "the cat sat on the mat".length - 2)
  }

  test("trainModel counts per language and caps at vocab deterministically") {
    val model = NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "the" appears 4x in en (2 docs x 2); every model row is lang-scoped
    assert(model(("en", "the")) == 4L)
    assert(model.keys.count(_._1 == "en") == 3)
    assert(model.keys.count(_._1 == "de") == 3)
    // vocab boundary tie-break is (count desc, tg asc): recompute exactly
    val enCounts = docs.filter($"lang" === "en")
      .select(explode(NgramLm.charNgrams(col("text"), 3)).as("tg"))
      .groupBy("tg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val expectTop3 = enCounts.sortBy { case (tg, c) => (-c, tg) }.take(3).toMap
    assert(model.collect { case ((l, tg), c) if l == "en" => tg -> c }.toMap == expectTop3)
  }

  test("score is the exact average model frequency; junk scores below normal text") {
    val model = NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 500)
    val scores = NgramLm.score(docs, "doc_id", "lang", "text", model, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // zero-trigram doc scores 0.0
    assert(scores(4L) == 0.0)
    // independent recompute of doc 1's score from first principles
    val enCounts = docs.filter($"lang" === "en")
      .select(explode(NgramLm.charNgrams(col("text"), 3)).as("tg"))
      .groupBy("tg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tgs1 = "the cat sat on the mat".sliding(3).toSeq
    val expected1 = tgs1.map(t => enCounts.getOrElse(t, 0L)).sum.toDouble / tgs1.size
    assert(scores(1L) == expected1)
    // the all-junk doc's trigrams are singletons -> score 1.0, strictly
    // below the normal docs, which share common trigrams
    assert(scores(3L) == 1.0)
    assert(scores(1L) > scores(3L) && scores(2L) > scores(3L))
  }

  test("model collect is cached per canonicalized model plan across rebuilt frames") {
    val before = NgramLm.modelCacheSize
    // two INDEPENDENTLY built model frames over the same source: new
    // ExprIds throughout, but the canonicalized plans are equal, so the
    // second score call must reuse the first call's collected model
    val s1 = NgramLm.score(docs, "doc_id", "lang", "text",
      NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 7), n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mid = NgramLm.modelCacheSize
    val s2 = NgramLm.score(docs, "doc_id", "lang", "text",
      NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 7), n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)
    assert(NgramLm.modelCacheSize == mid, "rebuilt identical model frame must hit the cache")
    assert(mid > before, "first score call must populate the cache")
    // a DIFFERENT model plan (other vocab cap) is a distinct entry, not
    // a false hit — scores change where the vocab boundary matters
    val s3 = NgramLm.score(docs, "doc_id", "lang", "text",
      NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 1), n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(NgramLm.modelCacheSize == mid + 1)
    // vocab=1 keeps only "the":4 for en, so doc 1 loses credit for all
    // its other in-vocab-at-7 trigrams
    assert(s3(1L) < s1(1L))
  }

  test("out-of-vocab trigrams contribute zero under a tight vocab cap") {
    val model = NgramLm.trainModel(docs, "lang", "text", n = 3, vocab = 1)
    val scores = NgramLm.score(docs, "doc_id", "lang", "text", model, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // en vocab-1 model = {"the": 4}; doc 3 shares nothing with it
    assert(scores(3L) == 0.0)
    assert(scores(1L) > 0.0)
  }

  test("qualityBuckets: per-lang tercile bands, ordered by score within each lang") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = NgramLm.trainModel(real, "lang", "text", n = 3, vocab = 500)
    val bands = NgramLm.qualityBuckets(real, "doc_id", "lang", "text", model, n = 3)
    val rows = bands.collect().map(r =>
      (r.getString(1), r.getDouble(2), r.getString(3)))
    // every lang gets all three bands, each ~a third of the lang
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, rs) =>
      val counts = rs.groupBy(_._3).view.mapValues(_.size).toMap
      assert(counts.keySet == Set("head", "middle", "tail"),
        s"$lang missing a band: $counts")
      val n = rs.size
      counts.values.foreach(c => assert(math.abs(c - n / 3.0) <= n / 3.0 * 0.5 + 2,
        s"$lang band sizes far from terciles: $counts"))
      // band ordering: min head score >= max tail score is too strong
      // under ties; but every head score must be >= every tail score
      val minHead = rs.filter(_._3 == "head").map(_._2).min
      val maxTail = rs.filter(_._3 == "tail").map(_._2).max
      assert(minHead >= maxTail, s"$lang: head score below a tail score")
    }
    // plan: thresholds broadcast back; no per-lang single-task window
    val plan = bands.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cuts join must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"banding must not use a window:\n$plan")
  }
}
