package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(xs: Seq[Double], q: Double): Double = {
    val sorted = xs.sorted
    val rank = math.max(1L, math.ceil(q * xs.size).toLong)
    sorted((rank - 1).toInt)
  }

  test("exactQuantiles equals the brute-force order statistic on mixed data") {
    // deterministic pseudo-random mix: duplicates, negatives, a point
    // mass at 7.0, non-round doubles
    val xs = (1 to 500).map(i => ((i * 2654435761L) % 1000).toDouble / 7.0 - 30.0) ++
      Seq.fill(40)(7.0) ++ Seq(-1e9, 1e9)
    val df = xs.toDF("v")
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = Quantiles.exactQuantiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for (q <- qs) {
      val expectRank = math.max(1L, math.ceil(q * xs.size).toLong)
      assert(got(q)._1 == expectRank, s"q=$q rank")
      assert(got(q)._2 == brute(xs, q), s"q=$q value: ${got(q)._2}")
    }
  }

  test("narrowing stays exact when forced through many passes") {
    // tiny buckets + tiny collect threshold: the loop must recurse
    // several times and still land on the exact order statistic
    val xs = (1 to 2000).map(i => math.sin(i.toDouble) * 1000.0)
    val df = xs.toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", Seq(0.5, 0.95),
        buckets = 4, collectThreshold = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(got(0.5) == brute(xs, 0.5))
    assert(got(0.95) == brute(xs, 0.95))
  }

  test("point-mass input resolves immediately; nulls and NaNs are excluded") {
    val allSame = Seq.fill(100)(42.5).toDF("v")
    val s = Quantiles.exactQuantiles(allSame, "v", Seq(0.5)).collect()(0)
    assert(s.getDouble(2) == 42.5 && s.getLong(1) == 50L)

    val withJunk = (Seq[java.lang.Double](1.0, 2.0, 3.0, null, Double.NaN))
      .toDF("v")
    val g = Quantiles.exactQuantiles(withJunk, "v", Seq(1.0)).collect()(0)
    // n=3 after exclusions: rank 3 -> 3.0 (NaN would sort last and poison max)
    assert(g.getLong(1) == 3L && g.getDouble(2) == 3.0)
  }

  test("groupedExactQuantile: per-group brute-force equality, simultaneous narrowing") {
    // three very different groups: spread, point mass, tiny
    val rows =
      (1 to 900).map(i => ("spread", math.cos(i.toDouble) * 500.0)) ++
      Seq.fill(50)(("mass", 3.25)) ++
      Seq(("tiny", 9.0), ("tiny", -4.0), ("tiny", 2.0))
    val df = rows.toDF("k", "v")
    // small buckets/threshold force real narrowing on the spread group
    val got = Quantiles.groupedExactQuantile(df, "k", "v", q = 0.5,
        buckets = 4, collectThreshold = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((k, xs) <- byKey) {
      val rank = math.max(1L, math.ceil(0.5 * xs.size).toLong)
      assert(got(k)._1 == rank, s"group $k rank")
      assert(got(k)._2 == xs.sorted.apply((rank - 1).toInt), s"group $k value")
    }
  }

  test("groupedExactQuantiles: several qs per group in one narrowing loop") {
    val rows =
      (1 to 900).map(i => ("spread", math.sin(i.toDouble) * 250.0)) ++
      Seq.fill(40)(("mass", -7.5)) ++
      Seq(("tiny", 9.0), ("tiny", -4.0), ("tiny", 2.0), ("tiny", 11.0))
    val df = rows.toDF("k", "v")
    val qs = Seq(0.25, 0.5, 0.75, 0.99)
    val got = Quantiles.groupedExactQuantiles(df, "k", "v", qs,
        buckets = 4, collectThreshold = 16)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.size == byKey.size * qs.size, "one row per (group, q)")
    for ((k, xs) <- byKey; q <- qs) {
      val rank = math.max(1L, math.ceil(q * xs.size).toLong)
      assert(got((k, q)) == ((rank, xs((rank - 1).toInt))), s"($k, $q)")
    }
    // multi-q output equals the union of single-q runs (the r14
    // x_acctbal_quartiles formulation this replaces)
    val single = qs.flatMap(q =>
      Quantiles.groupedExactQuantile(df, "k", "v", q,
        buckets = 4, collectThreshold = 16).collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3)))))
      .toMap
    assert(got == single)
    assertThrows[IllegalArgumentException](
      Quantiles.groupedExactQuantiles(df, "k", "v", Nil))
  }

  test("madOutliers: robust threshold flags the outlier the outlier can't inflate") {
    // 1..100 plus one 1e6: med = 51, MAD = 25, thr = 3*1.4826*25 =
    // 111.195 -> only the 1e6 row flags. (A mean/sigma rule has its
    // sigma inflated by the same point it is trying to flag.)
    val xs = (1 to 100).map(_.toDouble) :+ 1e6
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Quantiles.madOutliers(df, "v", k = 3.0)
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(1e6), s"flagged: $got")
    // null/NaN rows are never flagged; empty input stays empty
    val junk = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, null), (3L, Double.NaN)).toDF("id", "v")
    assert(Quantiles.madOutliers(junk, "v").count() == 0)
    assert(Quantiles.madOutliers(df.filter(lit(false)), "v").count() == 0)
  }

  test("winsorize: exact boundary clip, null/NaN pass-through") {
    // values 1..100: p05 boundary = rank ceil(0.05*100)=5 -> 5.0,
    // p95 -> 95.0
    val xs = (1 to 100).map(_.toDouble)
    val df = xs.map(v => (v.toLong, v)).toDF("id", "v")
    val got = Quantiles.winsorize(df, "v", pLo = 0.05, pHi = 0.95, outCol = "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 5.0 && got(4L) == 5.0, "low tail raised to p05")
    assert(got(5L) == 5.0 && got(50L) == 50.0 && got(95L) == 95.0)
    assert(got(96L) == 95.0 && got(100L) == 95.0, "high tail lowered to p95")

    val junk = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, null), (3L, Double.NaN)).toDF("id", "v")
    val j = Quantiles.winsorize(junk, "v", 0.5, 1.0).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(j(2L).isEmpty, "null passes through")
    assert(j(3L).exists(_.isNaN), "NaN passes through unclipped")
    assertThrows[IllegalArgumentException](
      Quantiles.winsorize(junk, "v", 0.9, 0.5))
  }

  test("groupedExactQuantile: group-cardinality guard fails loudly") {
    val df = (1 to 50).map(i => (s"g$i", i.toDouble)).toDF("k", "v")
    assertThrows[IllegalArgumentException](
      Quantiles.groupedExactQuantile(df, "k", "v", 0.5, maxGroups = 10))
  }

  test("withQuantileBuckets: equal-frequency labels, ties go down, null/NaN label null") {
    // 20 distinct values 1..20 into quartiles: boundaries at ranks
    // ceil(q*20) = 5, 10, 15 -> values 5.0, 10.0, 15.0
    val xs = (1 to 20).map(_.toDouble)
    val df = xs.map(v => (v.toLong, v)).toDF("id", "v")
    val got = Quantiles.withQuantileBuckets(df, "v", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (i <- 1 to 20) {
      val expect = if (i <= 5) 1L else if (i <= 10) 2L else if (i <= 15) 3L else 4L
      assert(got(i.toLong) == expect, s"value $i -> ${got(i.toLong)}")
    }
    // a value EQUAL to a boundary stays in the lower bucket (5 -> 1)
    assert(got(5L) == 1L && got(10L) == 2L && got(15L) == 3L)

    val junk = Seq[(java.lang.Long, java.lang.Double)]((1L, 2.0), (2L, null),
        (3L, Double.NaN)).toDF("id", "v")
    val j = Quantiles.withQuantileBuckets(junk, "v", 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(j(2L).isEmpty && j(3L).isEmpty, "null and NaN must label null")
  }

  test("withQuantileBuckets: labeling pass is shuffle-free after selection") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Quantiles.withQuantileBuckets(df, "v", 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decile labeling must be a broadcast-array projection:\n$plan")
    assertThrows[IllegalArgumentException](
      Quantiles.withQuantileBuckets(df, "v", 1))
    assertThrows[IllegalArgumentException](
      Quantiles.withQuantileBuckets(out, "v", 4)) // 'bucket' reserved
  }

  test("empty input yields an empty frame; bad parameters fail loudly") {
    val empty = Seq.empty[Double].toDF("v")
    assert(Quantiles.exactQuantiles(empty, "v", Seq(0.5)).count() == 0)
    val df = Seq(1.0).toDF("v")
    assertThrows[IllegalArgumentException](
      Quantiles.exactQuantiles(df, "v", Seq.empty))
    assertThrows[IllegalArgumentException](
      Quantiles.exactQuantiles(df, "v", Seq(0.0)))
    assertThrows[IllegalArgumentException](
      Quantiles.exactQuantiles(df, "v", Seq(1.5)))
  }
}
