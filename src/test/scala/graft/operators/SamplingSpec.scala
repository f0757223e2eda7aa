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

  test("withFold: every row gets one fold in [0,k); deterministic; fold formula matches bucket ranges") {
    val folded = Sampling.withFold(docs, "doc_id", k = 5)
    val rows = folded.select(col("doc_id"), col("fold")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == docs.count())
    assert(rows.forall { case (_, f) => f >= 0 && f < 5 })
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L),
      "all five folds should be populated on 500 docs")
    // fold == contiguous-range formula over the same salted bucket
    val withBucket = docs.select(col("doc_id"),
      Sampling.hashBucket(col("doc_id"), salt = 3L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, f) =>
      assert(f == withBucket(id) * 5 / 1000, s"doc $id fold $f bucket ${withBucket(id)}")
    }
    // deterministic across evaluations
    val again = Sampling.withFold(docs, "doc_id", k = 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(again.toSet == rows.toSet)
    // salt isolation: folds are not constant within a split label
    val both = Sampling.withFold(Sampling.withSplit(docs, "doc_id"), "doc_id")
    assert(both.filter(col("split") === "val").select("fold").distinct().count() > 1)
  }

  test("withFold rejects bad k and a reserved column") {
    assertThrows[IllegalArgumentException](Sampling.withFold(docs, "doc_id", k = 1))
    assertThrows[IllegalArgumentException](
      Sampling.withFold(docs.withColumn("fold", lit(0)), "doc_id"))
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

  // independent replay of the operator's integer math: weights are
  // floor(sqrt(tot)), rates 64-bit floor division, keep decision the
  // salt-3 per-mill hash — all computed here in plain Scala
  private def expectedMix(rows: Seq[(Long, String, Long)], budget: Long)
      : (Map[String, Long], Set[Long]) = {
    val tot = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val w = tot.view.mapValues(t => math.sqrt(t.toDouble).toLong).toMap
    val denom = w.values.sum
    val rate = tot.map { case (s, t) =>
      s -> (if (t == 0 || denom == 0) 0L
            else math.min(1000L, 1000L * w(s) * budget / (denom * t)))
    }
    def hash(id: Long): Long = {
      val p = 2147483647L
      (((id % p + 3) % p * 1103515245L % p) * 784588716L % p) % 1000L
    }
    (rate, rows.collect { case (id, s, _) if hash(id) < rate(s) => id }.toSet)
  }

  test("temperatureMix: rates and membership match an independent integer replay") {
    val rows = Seq[(Long, String, Long)](
      (1L, "big", 4000L), (2L, "big", 4000L), (3L, "big", 4000L), (4L, "big", 4000L),
      (5L, "small", 100L), (6L, "small", 150L), (7L, "mid", 900L), (8L, "mid", 850L))
    val df = rows.toDF("id", "src", "n_tok")
    val out = Sampling.temperatureMix(df, "id", "n_tok", "src", budgetTokens = 2000L)
    val got = out.select("id", "rate_mill").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (rate, keep) = expectedMix(rows, 2000L)
    assert(got.keySet == keep)
    got.foreach { case (id, rm) =>
      val src = rows.find(_._1 == id).get._2
      assert(rm == rate(src), s"id $id rate $rm != expected ${rate(src)}")
    }
    // temperature UP-weights small sources: per-token keep rate is
    // ∝ 1/sqrt(tot_s), so the smaller source's rate must be strictly
    // higher than the 40x-bigger one's
    assert(rate("small") > rate("big"),
      s"alpha=1/2 must up-weight the small source: $rate")
  }

  test("temperatureMix: large budget caps every rate at 1000 and keeps everything") {
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "src", "n_tok")
    val out = Sampling.temperatureMix(df, "id", "n_tok", "src", budgetTokens = 1000000L)
    assert(out.count() == 2)
    assert(out.select("rate_mill").distinct().collect().map(_.getLong(0)).toSet == Set(1000L))
  }

  test("temperatureMix: zero-token source gets rate 0, not a division error") {
    val df = Seq((1L, "a", 100L), (2L, "empty", 0L)).toDF("id", "src", "n_tok")
    val out = Sampling.temperatureMix(df, "id", "n_tok", "src", budgetTokens = 50L)
    assert(!out.select("src").collect().map(_.getString(0)).contains("empty"))
  }

  test("temperatureMix rejects reserved columns and out-of-audit budgets") {
    val df = Seq((1L, "a", 10L)).toDF("id", "src", "n_tok")
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMix(df.withColumn("rate_mill", lit(1L)),
        "id", "n_tok", "src", budgetTokens = 10L))
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMix(df, "id", "n_tok", "src", budgetTokens = 0L))
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMix(df, "id", "n_tok", "src",
        budgetTokens = 10000000001L))
  }

  test("temperatureMix: corpus side never shuffles (broadcast rates join)") {
    val out = Sampling.temperatureMix(docs, "doc_id", "n_chars", "lang",
      budgetTokens = 60000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"rates join must broadcast:\n$plan")
  }

  test("mixManifest: realized aggregates equal re-aggregating the row-level mix") {
    val manifest = Sampling.mixManifest(docs, "doc_id", "n_chars", "lang",
      budgetTokens = 60000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(r.fieldIndex("kept_docs")),
        r.getLong(r.fieldIndex("kept_tokens"))))).toMap
    val rowLevel = Sampling.temperatureMix(docs, "doc_id", "n_chars", "lang",
      budgetTokens = 60000L)
      .groupBy("lang").agg(count(lit(1)).as("kd"), sum("n_chars").as("kt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.filter(_._2._1 > 0) == rowLevel,
      "manifest kept_docs/kept_tokens must equal the row-level mix re-aggregated")
  }

  test("mixManifest: zero-rate sources keep explicit 0 rows") {
    val df = Seq((1L, "big", 4000000L), (2L, "tiny", 1L)).toDF("id", "src", "n_tok")
    // budget small enough that 'tiny' still gets a nonzero rate (small
    // sources are UP-weighted) — so force a zero by a zero-token source
    val withEmpty = df.union(Seq((3L, "empty", 0L)).toDF("id", "src", "n_tok"))
    val m = Sampling.mixManifest(withEmpty, "id", "n_tok", "src", budgetTokens = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(r.fieldIndex("rate_mill")), r.getLong(r.fieldIndex("kept_docs"))))).toMap
    assert(m.contains("empty"), "zero-token source must appear in the manifest")
    assert(m("empty") == ((0L, 0L)))
    assert(m.keySet == Set("big", "tiny", "empty"))
  }

  // independent LCG replay for hashRank (no final per-mill collapse)
  private def lcgRank(id: Long, salt: Long): Long = {
    val P = 2147483647L
    val r0 = (id % P) + (((salt % P) + P) % P)
    val r1 = (r0 * 1103515245L) % P
    (r1 * 784588716L) % P
  }

  test("perKeySample: <= k per key in replayed hash order; samples nest") {
    val df = ((1L to 10L).map(i => (i, "a")) ++ Seq((11L, "b"))).toDF("id", "key")
    val got = Sampling.perKeySample(df, "id", "key", k = 3, salt = 4L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    assert(got.count(_._1 == "a") == 3, s"key 'a' must cap at 3: ${got.toSeq}")
    assert(got.count(_._1 == "b") == 1, "undersized keys keep everything")
    // the kept ids and their rn order must equal the independent replay
    val expectA = (1L to 10L).sortBy(i => (lcgRank(i, 4L), i)).take(3)
    assert(got.filter(_._1 == "a").sortBy(_._3).map(_._2).toSeq == expectA,
      s"hash order mismatch: got ${got.toSeq}, want $expectA")
    // nesting: k=2 sample is a strict prefix of the k=3 sample
    val k2 = Sampling.perKeySample(df, "id", "key", k = 2, salt = 4L)
      .filter(col("key") === "a").collect().map(_.getLong(0)).toSet
    assert(k2 == expectA.take(2).toSet, "k=2 must be a prefix of k=3")
  }

  test("perKeySample: rank filter rewrites to a Partial WindowGroupLimit (scale guard)") {
    val df = (1L to 50L).map(i => (i, s"s${i % 3}")).toDF("id", "key")
    val p = Sampling.perKeySample(df, "id", "key", k = 5)
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toIndexedSeq
    val pi = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(pi >= 0, s"no Partial WindowGroupLimit — a hot key would ship whole:\n$p")
    val ei = lines.lastIndexWhere(_.contains("Exchange hashpartitioning(key"), pi)
    assert(ei >= 0 && ei < pi, s"Partial limit is not upstream of the key exchange:\n$p")
  }

  test("perKeySample rejects bad k and a reserved rn column") {
    val df = Seq((1L, "a")).toDF("id", "key")
    assertThrows[IllegalArgumentException](Sampling.perKeySample(df, "id", "key", 0))
    assertThrows[IllegalArgumentException](
      Sampling.perKeySample(df.withColumn("rn", lit(1)), "id", "key", 1))
  }

  test("epochOrder: exact permutation, replayed order, epochs decorrelate") {
    val ids = (1L to 200L)
    val df = ids.map(i => (i, s"t$i")).toDF("id", "txt")
    val e2 = Sampling.epochOrder(df, "id", epoch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pos is a 0-based permutation of the whole corpus
    assert(e2.map(_._2).sorted.toSeq == (0L until 200L))
    // order equals the independent (rank, id) replay at salt 100+2
    val expect = ids.sortBy(i => (lcgRank(i, 102L), i)).toSeq
    assert(e2.sortBy(_._2).map(_._1).toSeq == expect)
    // a different epoch yields a genuinely different permutation
    val e3 = Sampling.epochOrder(df, "id", epoch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).map(_._1)
    assert(e3.toSeq != e2.sortBy(_._2).map(_._1).toSeq)
  }

  test("curriculumOrder: bands progress, in-band epoch shuffle, nulls last") {
    // difficulties 1..40 -> quartile bands of 10; one null-difficulty row
    val df = ((1L to 40L).map(i =>
        (i, java.lang.Double.valueOf(i.toDouble))) :+
        ((41L, null.asInstanceOf[java.lang.Double])))
      .toDF("id", "diff")
    val got = Sampling.curriculumOrder(df, "id", "diff", nBands = 4, epoch = 2)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2)))
    // every band-1 position precedes every band-2 position, etc.
    val posByBand = got.filter(_._2.isDefined)
      .groupBy(_._2.get).view.mapValues(_.map(_._3)).toMap
    for (b <- 1L to 3L)
      assert(posByBand(b).max < posByBand(b + 1).min, s"band $b overlaps ${b + 1}")
    // the null-difficulty row is LAST
    assert(got.find(_._1 == 41L).get._3 == 40L)
    // in-band order equals the LCG replay at salt 200+2
    val band1 = got.filter(_._2.contains(1L)).sortBy(_._3).map(_._1).toSeq
    assert(band1 == (1L to 10L).sortBy(i => (lcgRank(i, 202L), i)).toSeq)
    // a different epoch re-shuffles within bands, not across them
    val e3 = Sampling.curriculumOrder(df, "id", "diff", nBands = 4, epoch = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    val band1e3 = e3.filter(_._2.contains(1L)).sortBy(_._3).map(_._1).toSeq
    assert(band1e3.toSet == band1.toSet && band1e3 != band1,
      "epoch must permute WITHIN the band")
  }

  test("interleaveOrder: round-robin across unequal sources, replayed in-source order") {
    // sources: a has 5 docs, b has 2, c has 1 — after b and c exhaust,
    // the tail is pure a
    val df = ((1L to 5L).map(i => (i, "a")) ++ Seq((6L, "b"), (7L, "b"), (8L, "c")))
      .toDF("id", "src")
    val got = Sampling.interleaveOrder(df, "id", "src", epoch = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pos is a 0-based permutation
    assert(got.map(_._4).sorted.toSeq == (0L until 8L))
    // every rn=0 row precedes every rn=1 row, etc. (the interleave law)
    val byRn = got.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    for (r <- 0L to 3L; if byRn.contains(r + 1))
      assert(byRn(r).max < byRn(r + 1).min, s"rn $r rows overlap rn ${r + 1}")
    // within a source, rn follows the LCG replay at salt 300+1
    val aOrder = got.filter(_._2 == "a").sortBy(_._3).map(_._1).toSeq
    assert(aOrder == (1L to 5L).sortBy(i => (lcgRank(i, 301L), i)).toSeq)
    // round 0 holds one doc of each source, ordered a, b, c
    val round0 = got.filter(_._3 == 0L).sortBy(_._4).map(_._2).toSeq
    assert(round0 == Seq("a", "b", "c"))
  }

  test("epochOrder: no single-task window; null ids fail loudly") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "x")
    val p = Sampling.epochOrder(df, "id", 0).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"epoch order must not use a global window:\n$p")
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(null.asInstanceOf[java.lang.Long])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val ex = intercept[org.apache.spark.SparkException](
      Sampling.epochOrder(withNull, "id", 0).collect())
    assert(ex.getMessage.contains("null") || ex.getCause != null)
  }
}
