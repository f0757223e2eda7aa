package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val rows = Seq("the quick brown fox", "hello, world!", "", "   ")
      .toDF("t")
      .select(
        TextAnalysis.tokenCount(col("t")).as("n"),
        TextAnalysis.bpeishTokenCount(col("t")).as("b"))
      .collect()
    assert(rows(0).getInt(0) == 4)
    assert(rows(1).getInt(0) == 2)
    assert(rows(1).getInt(1) == 4) // hello , world !
    assert(rows(2).getInt(0) == 0)
    assert(rows(3).getInt(0) == 0)
  }

  test("chunkWindows: stride windows, tail rule, overlap, degenerate docs") {
    val doc10 = (0 until 10).map(i => s"t$i").mkString(" ")
    val got = Seq((1L, doc10), (2L, "a b"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkWindows(got, "doc_id", "text", size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    // m=10, size=4, stride=3: starts 0,3,6 — chunk 6 reaches token 9 and
    // stops the emission (no redundant trailing sub-chunk at start 9)
    assert(chunks.keys.count(_._1 == 1L) == 3)
    assert(chunks((1L, 0)) == (("t0 t1 t2 t3", 4)))
    assert(chunks((1L, 1)) == (("t3 t4 t5 t6", 4)))
    assert(chunks((1L, 2)) == (("t6 t7 t8 t9", 4)))
    // shorter than size: one whole-doc chunk
    assert(chunks.keys.count(_._1 == 2L) == 1)
    assert(chunks((2L, 0)) == (("a b", 2)))
    // empty / whitespace-only: no rows
    assert(!chunks.keys.exists(k => k._1 == 3L || k._1 == 4L))
    // count formula the oracle uses: 1 + ceil(max(0, m-size)/stride),
    // for every m in 1..40 under several (size, stride) shapes
    val docs = (1 to 40).map(m => (m.toLong, (0 until m).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    for (sz <- Seq(4, 7, 16); stride <- Seq(2, 3, 12)) {
      val counts = docs.select(col("doc_id"),
          size(graft.functions.VectorFunctions
            .chunkTokens(col("text"), sz, stride)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for (m <- 1 to 40) {
        val expect = 1 + math.ceil(math.max(0, m - sz).toDouble / stride).toInt
        assert(counts(m.toLong) == expect, s"m=$m size=$sz stride=$stride")
      }
    }
  }

  test("punct and stopword ratios") {
    val r = Seq("the cat!!").toDF("t").select(
      TextAnalysis.punctRatio(col("t")).as("p"),
      TextAnalysis.stopwordRatio(col("t")).as("s")).collect()(0)
    assert(math.abs(r.getDouble(0) - 2.0 / 9.0) < 1e-9)
    assert(r.getDouble(1) == 0.5) // "the" of ["the","cat!!"]
  }

  test("mean token length") {
    val r = Seq("ab cdef").toDF("t")
      .select(TextAnalysis.meanTokenLen(col("t")).as("m")).collect()(0)
    assert(r.getDouble(0) == 3.0)
  }

  test("quality score bounded in [0,1]") {
    val scores = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(scores.getDouble(0) >= 0.0)
    assert(scores.getDouble(1) <= 1.0)
  }

  test("langId picks the dominant marker language; und when none") {
    val rows = Seq(
      "the cat and the dog is in the house",
      "der hund und die katze ist nicht hier",
      "le chat est dans la maison pour toujours",
      "el perro es una mascota para la familia",
      "zzz qqq xxx").toDF("t")
      .select(TextAnalysis.langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint: equal token sequences collide, order matters") {
    val rows = Seq("a b c", "a  b   c", "c b a").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f")).collect().map(_.getLong(0))
    assert(rows(0) == rows(1)) // whitespace-insensitive
    assert(rows(0) != rows(2)) // order-sensitive
  }

  test("repetition signals: goldens and kernel-vs-brute-force on real docs") {
    // goldens: hand-computed
    val rows = Seq(
      "a b a b a b",          // 5 bigrams: "a b"x3, "b a"x2 -> 3/5; lines: 1 dup 0
      "x\ny\nx\nx",           // 4 lines, 2 distinct -> 2/4; bigrams unique -> 1/3
      "one two three",        // all bigrams unique -> 1/2
      "solo",                 // <2 tokens -> 0
      "")                     // empty -> 0, single empty line -> 0
      .toDF("t").select(
        TextAnalysis.duplicateLineFraction(col("t")).as("d"),
        TextAnalysis.topNgramFraction(col("t"), 2).as("g2"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((0.0, 3.0 / 5), (0.5, 1.0 / 3), (0.0, 0.5),
      (0.0, 0.0), (0.0, 0.0)))

    // kernel agrees with a naive Scala recomputation over the corpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"), TextAnalysis.topNgramFraction(col("text"), 3).as("g3"))
      .collect()
    docs.foreach { r =>
      val toks = r.getString(0).trim.split("\\s+").toSeq
      val expect =
        if (toks.length < 3) 0.0
        else {
          val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
          grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
        }
      assert(r.getDouble(1) == expect)
    }
  }

  test("duplicateNgramFraction: goldens and kernel-vs-brute-force on real docs") {
    // goldens: hand-computed (grams - distinct)/grams
    val rows = Seq(
      "a b a b a b",     // bigrams: "a b"x3,"b a"x2 -> (5-2)/5; trigrams (4-2)/4
      "one two three",   // all unique -> 0, 0
      "solo",            // <2 tokens -> 0
      "")                // empty -> 0
      .toDF("t").select(
        TextAnalysis.duplicateNgramFraction(col("t"), 2).as("d2"),
        TextAnalysis.duplicateNgramFraction(col("t"), 3).as("d3"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((3.0 / 5, 2.0 / 4), (0.0, 0.0), (0.0, 0.0), (0.0, 0.0)))

    // kernel agrees with a naive Scala recomputation over the corpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"), TextAnalysis.duplicateNgramFraction(col("text"), 3).as("d3"))
      .collect()
    docs.foreach { r =>
      val toks = r.getString(0).trim.split("\\s+").toSeq
      val expect =
        if (toks.length < 3) 0.0
        else {
          val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
          (grams.size - grams.distinct.size).toDouble / grams.size
        }
      assert(r.getDouble(1) == expect)
    }
  }

  test("vocabulary: frequency order, token tie-break, empty-token filter, k cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a a a"),
      (2L, "b b c a"),
      (3L, "   "), // whitespace-only: contributes nothing
      (4L, "d c")
    ).toDF("doc_id", "text")
    // freqs: a=4, b=3, c=2, d=1 — k=3 cuts d; ties (none here at the
    // cut) would resolve token-ascending
    val top = TextAnalysis.vocabulary(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a", 4L), ("b", 3L), ("c", 2L)))
    // tie at the cut: x and y both freq 1 — x wins alphabetically
    val tied = TextAnalysis.vocabulary(
      Seq((1L, "z z y x")).toDF("doc_id", "text"), "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tied == Seq(("z", 2L), ("x", 1L)))
  }

  test("tfidf: log variant matches a hand computation; topK ranks deterministically") {
    import spark.implicits._
    // 3 docs; "cat" in 1 doc, "the" in all 3, "dog" in 2
    val docs = Seq(
      (1L, "the cat the cat sat"),
      (2L, "the dog sat"),
      (3L, "THE dog ran")
    ).toDF("doc_id", "text")

    val scored = TextAnalysis.tfidf(docs, "doc_id", "text", logIdf = true)
      .collect().map(r => ((r.getLong(1), r.getString(0)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def idf(df: Long) = math.log(4.0 / (df + 1))
    // doc 1: the tf=2 df=3; cat tf=2 df=1; sat tf=1 df=2
    assert(scored((1L, "cat")) == ((2L, 1L, 2.0 * idf(1))))
    assert(scored((1L, "the")) == ((2L, 3L, 2.0 * idf(3))))
    assert(scored((2L, "sat")) == ((1L, 2L, 1.0 * idf(2))))
    assert(scored((3L, "the"))._1 == 1L) // lower-cased tokenization

    // topK: doc 1's best term is "cat" (high tf, rare); rank 1 exactly
    val top1 = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    assert(top1(1L) == "cat")
    // tie-break: doc 3's "dog" and "ran"... dog df=2, ran df=1 -> ran wins;
    // within equal (tf, df) scores the token ascending order decides
    val d3 = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter($"doc_id" === 3L).orderBy($"rank")
      .select("token").as[String].collect().toSeq
    assert(d3 == Seq("ran", "dog", "the"))
  }

  test("documentFeatures projects the full feature set over real docs") {
    val feats = TextAnalysis.documentFeatures(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    assert(feats.columns.toSeq == Seq("doc_id", "n_tokens", "n_bpeish_tokens",
      "n_chars", "mean_token_len", "punct_ratio", "stopword_ratio",
      "quality_score", "lang_pred", "fingerprint"))
    assert(feats.count() == 500)
    // n_chars from the engine matches the table's own n_chars column
    val joined = feats.alias("f").join(
      spark.read.parquet(s"$sfDir/documents.parquet").alias("d"), "doc_id")
      .filter(col("f.n_chars") =!= col("d.n_chars"))
    assert(joined.count() == 0)
  }

  test("bpePairCounts: freq-weighted pair counts, case folding, determinism") {
    // "ab" appears in: abc (2 docs' worth: 'abc abc' counts freq 2... word
    // freq is per-occurrence), "AB" folds to ab
    val df = Seq("abc abc AB", "xyz a", "").toDF("text")
    val out = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // words: abc(freq 2), AB(1), xyz(1), a(1, no pair)
    assert(out("ab") == 3L) // 2 from abc + 1 from folded AB
    assert(out("bc") == 2L)
    assert(out("xy") == 1L && out("yz") == 1L)
    assert(!out.contains("a")) // single-char words emit no pair
    // deterministic cut: k=1 must take the max count
    val top = TextAnalysis.bpePairCounts(df, "text", k = 1).collect()
    assert(top.length == 1 && top(0).getString(0) == "ab")
    // plan: top-k is a TakeOrderedAndProject, not a global sort
    val plan = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("gopherRules: each rule fires on its designed violation") {
    val good = (("the quick brown fox jumped over the lazy dog and it was fine " * 5)
      .trim) // 65 tokens, natural lengths, stopwords present, no repeats
    val short = "the quick fox" // violates token count
    val longWords = Array.fill(60)("extraordinarily").mkString(" ") // mean len > 10, repetition
    val repeated = Array.fill(60)("ab cd").mkString(" ") // top bigram dominates
    val boiler = ("the quick brown fox jumped over the lazy dog and it was fine " * 5)
      .trim + "\nsubscribe now\nsubscribe now\nsubscribe now\nsubscribe now" // dup lines
    val noStops = Array.fill(60)(Seq("alpha", "beta", "gamma", "delta")).flatten
      .mkString(" ") // no stopwords
    val df = Seq(
      (1L, good), (2L, short), (3L, longWords), (4L, repeated),
      (5L, boiler), (6L, noStops), (7L, ""), (8L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = TextAnalysis.gopherRules(df, "id", "text",
      minTokens = 50, maxTokens = 100000, minMeanTokLen = 3.0,
      maxMeanTokLen = 10.0, maxTop2Frac = 0.2, maxDupLineFrac = 0.3,
      minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    def rules(id: Long): (Int, Int, Int, Int, Int, Int) = {
      val r = out(id)
      (r.getInt(r.fieldIndex("r_token_count")), r.getInt(r.fieldIndex("r_word_len")),
        r.getInt(r.fieldIndex("r_repetition")), r.getInt(r.fieldIndex("r_boilerplate")),
        r.getInt(r.fieldIndex("r_stopwords")), r.getInt(r.fieldIndex("keep")))
    }
    assert(rules(1L) == ((1, 1, 1, 1, 1, 1)), "clean doc must pass every rule")
    assert(rules(2L)._1 == 0 && rules(2L)._6 == 0, "short doc fails token count")
    assert(rules(3L)._2 == 0, "long-word doc fails mean token length")
    assert(rules(4L)._3 == 0, "repeated bigram fails repetition")
    assert(rules(5L)._4 == 0, "boilerplate lines fail duplicate-line rule")
    assert(rules(6L)._5 == 0 && rules(6L)._3 == 0, "stopword-free doc fails stopwords")
    // degenerate docs: zero signals, fail length + stopwords, never NaN/null
    for (id <- Seq(7L, 8L)) {
      val r = out(id)
      assert(r.getInt(r.fieldIndex("n_tokens")) == 0)
      assert(r.getInt(r.fieldIndex("stop_hits")) == 0)
      assert(r.getInt(r.fieldIndex("keep")) == 0)
    }
  }

  test("bm25TopK: classic scores match the hand formula; ranking and cut deterministic") {
    // 4 docs, query {spark, join}: df(spark)=2 (docs 1,2), df(join)=2
    // (docs 1,3), N=4, lengths 4/4/2/4, avgdl = 14/4
    val docs = Seq(
      (1L, "spark join spark fast"), // spark tf=2, join tf=1
      (2L, "spark slow slow slow"),  // spark tf=1
      (3L, "join join"),             // join tf=2, short doc
      (4L, "other words only here")  // no hits -> absent
    ).toDF("doc_id", "text")
    val k1 = 1.2; val b = 0.75
    val n = 4.0; val avgdl = 14.0 / 4.0
    def idf(dfreq: Int): Double = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf: Long, dl: Long, dfreq: Int): Double =
      idf(dfreq) * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
    val expect = Map(
      1L -> (term(1, 4, 2) + term(2, 4, 2)), // token-ascending fold: join, spark
      2L -> term(1, 4, 2),
      3L -> term(2, 2, 2))
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet, "docs without query terms must be absent")
    for ((id, e) <- expect) assert(math.abs(got(id) - e) < 1e-12, s"doc $id")
    // short doc 3 outranks doc 2: rarer term, higher tf, shorter length
    assert(got(3L) > got(2L) && got(1L) > got(3L))
    // rational variant: same ranking here, deterministic doc_id cut at k
    val rational = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 2, logIdf = false).collect().map(_.getLong(0))
    assert(rational.sameElements(Array(1L, 3L)))
    // plan: global top-k is a TakeOrderedAndProject, never a full sort
    val plan = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("cooccurrenceLift: lift math, min-count cut, log-PMI monotone equivalence") {
    // 6 docs: {a,b} always together (lift 6/4 = 1.5 over 4 docs each);
    // {a,c} in 2 of a's 4 docs, c in 4 docs -> lift 6*2/(4*4) = 0.75;
    // {d,e} co-occur once -> cut by minCount 2
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"), (4L, "a b d"),
      (5L, "c e d"), (6L, "c e")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text",
        k = 10, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("a", "b")) == ((4L, 4L, 4L, 6.0 * 4 / (4 * 4))))
    assert(got(("a", "c")) == ((2L, 4L, 4L, 6.0 * 2 / (4 * 4))))
    assert(!got.contains(("d", "e")), "single co-occurrence cut by minCount")
    assert(!got.contains(("b", "a")), "pairs are ordered token_a < token_b")
    // log variant ranks identically (ln is monotone on lift)
    val rat = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text", 10, 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val logv = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text", 10, 2,
      logPmi = true).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rat.sameElements(logv))
    // and its values are ln(lift)
    val logMap = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text", 10, 2,
        logPmi = true).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(math.abs(logMap(("a", "b")) - math.log(1.5)) < 1e-12)
  }

  test("ngramNovelty: shared grams lower novelty; short docs zeroed; repeats deduped") {
    val docs = Seq(
      (1L, "a b c d"),   // grams {a b c, b c d}: first shared with doc 2
      (2L, "a b c x"),   // grams {a b c, b c x}
      (3L, "z z z z"),   // grams dedupe to the single {z z z}
      (4L, "q w")        // too short for 3-grams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((1L, 1L, 1.0)), "within-doc repeats dedupe before df")
    assert(got(4L) == ((0L, 0L, 0.0)), "short doc: no grams, novelty 0")
  }

  test("readability: hand-computed counts and grade; clamps on degenerate docs") {
    val docs = Seq(
      // "See the dog. It runs!" -> 5 words, 2 sentence runs,
      // vowel groups: S[ee] th[e] d[o]g [I]t r[u]ns = 5
      (1L, "See the dog. It runs!"),
      // no terminal punctuation: sentence count 0, clamped to 1
      (2L, "no end here"),
      // empty text: all counters 0, grade = constant floor
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L)._1 == 5L && got(1L)._2 == 2L && got(1L)._3 == 5L,
      s"counter mismatch: ${got(1L)}")
    assert(got(1L)._4 == 0.39 * (5.0 / 2.0) + 11.8 * (5.0 / 5.0) - 15.59)
    // clamp: 3 words / max(1,0) sentences; "no end here" has 4 vowel runs
    assert(got(2L) == ((3L, 0L, 4L,
      0.39 * (3.0 / 1.0) + 11.8 * (4.0 / 3.0) - 15.59)), s"got ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0.39 * 0.0 + 11.8 * 0.0 - 15.59)))
  }

  test("readability is a pure projection (no shuffle, no UDF)") {
    val docs = Seq((1L, "a b.")).toDF("doc_id", "text")
    val plan = TextAnalysis.readability(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"readability must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
