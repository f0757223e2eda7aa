package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CappedCollectSpec extends SparkTestBase {
  import spark.implicits._
  import CappedCollect.cappedCollect

  test("under the cap: exact count and the complete value set") {
    val df = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L)).toDF("k", "v")
    val got = df.groupBy("k").agg(cappedCollect(col("v"), 5).as("cc"))
      .select(col("k"), col("cc.cnt"), array_sort(col("cc.vals")).as("vals"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(got(1L) == ((3L, Seq(10L, 11L, 12L))))
    assert(got(2L) == ((1L, Seq(20L))))
  }

  test("over the cap: count stays exact while the buffer stops at cap") {
    // 10k copies of one key across 8 partitions — the viral-duplicate
    // shape; buffer must hold <= 3 values yet count all 10k exactly
    val df = spark.range(10000).select(lit(7L).as("k"), col("id").as("v"))
      .repartition(8)
    val r = df.groupBy("k").agg(cappedCollect(col("v"), 3).as("cc"))
      .select(col("cc.cnt"), size(col("cc.vals"))).collect()(0)
    assert(r.getLong(0) == 10000L)
    assert(r.getInt(1) == 3)
  }

  test("completeness invariant survives multi-partition merge at the cap boundary") {
    // exactly cap values, spread over more partitions than cap
    val df = spark.range(4).select(lit(1L).as("k"), col("id").as("v"))
      .repartition(6)
    val r = df.groupBy("k").agg(cappedCollect(col("v"), 4).as("cc"))
      .select(col("cc.cnt"), array_sort(col("cc.vals"))).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getSeq[Long](1) == Seq(0L, 1L, 2L, 3L))
  }

  test("nulls are neither counted nor collected") {
    val df = Seq((1L, Some(5L)), (1L, None), (1L, Some(6L))).toDF("k", "v")
    val r = df.groupBy("k").agg(cappedCollect(col("v"), 10).as("cc"))
      .select(col("cc.cnt"), array_sort(col("cc.vals"))).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[Long](1) == Seq(5L, 6L))
  }

  test("struct elements round-trip through the serialized shuffle path") {
    val df = Seq((1L, 10L, 3), (1L, 11L, 4), (2L, 20L, 5)).toDF("k", "id", "sz")
      .repartition(4) // force partial/final split so serialize/deserialize runs
    val got = df.groupBy("k")
      .agg(cappedCollect(struct(col("id"), col("sz")), 10).as("cc"))
      .select(col("k"), array_sort(col("cc.vals")).as("vals"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getInt(1))))
      .toMap
    assert(got(1L) == Seq((10L, 3), (11L, 4)))
    assert(got(2L) == Seq((20L, 5)))
  }

  test("property: equals collect_list + count for random data under a generous cap") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val parts = 1 + rnd.nextInt(8)
      val rows = (0 until 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      val df = rows.toDF("k", "v").repartition(parts)
      val got = df.groupBy("k")
        .agg(cappedCollect(col("v"), 1000).as("cc"))
        .select(col("k"), col("cc.cnt"), array_sort(col("cc.vals")))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      val expect = rows.groupBy(_._1).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._2).sorted.toSeq))
      }
      assert(got == expect, s"round $round parts $parts")
    }
  }

  test("property: cnt stays exact under any cap; vals size = min(cnt, cap)") {
    val rnd = new scala.util.Random(13)
    for (cap <- Seq(1, 3, 17)) {
      val rows = (0 until 400).map(_ => (rnd.nextInt(5).toLong, rnd.nextLong()))
      val got = rows.toDF("k", "v").repartition(6)
        .groupBy("k").agg(cappedCollect(col("v"), cap).as("cc"))
        .select(col("k"), col("cc.cnt"), size(col("cc.vals")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val exact = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got.foreach { case (k, cnt, nVals) =>
        assert(cnt == exact(k), s"cap $cap key $k")
        assert(nVals == math.min(cnt, cap.toLong), s"cap $cap key $k")
      }
    }
  }

  test("property: invariants hold under EXPLICIT partition splits and random merge trees") {
    // The end-to-end property tests above leave the partial/merge split
    // to whatever Spark's partitioning happens to produce; this drives
    // update/merge/serialize DIRECTLY so every split shape and merge
    // order is exercised — the associativity the partial-aggregation
    // contract requires: for ANY split of the input into partial
    // buffers and ANY merge tree over them, cnt is exact, |vals| =
    // min(cnt, cap), vals ⊆ the input multiset, and (completeness
    // invariant) cnt <= cap implies vals == the input multiset.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 200) {
      val cap = 1 + rnd.nextInt(8)
      val agg = CappedCollect(BoundReference(0, LongType, nullable = false), cap)
      val n = rnd.nextInt(40)
      val values = Vector.fill(n)(rnd.nextInt(10).toLong) // duplicates likely
      // random ordered split into 1..8 chunks (some possibly empty)
      val nChunks = 1 + rnd.nextInt(8)
      val cuts = (Vector.fill(nChunks - 1)(rnd.nextInt(n + 1)) :+ 0 :+ n).sorted
      val chunks = cuts.sliding(2).map { case Seq(a, b) => values.slice(a, b) }.toVector
      val partials = chunks.map { chunk =>
        chunk.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(v))
        }
      }
      // half the partials take the serialize/deserialize shuffle path
      val pool = scala.collection.mutable.ArrayBuffer.from(partials.map { b =>
        if (rnd.nextBoolean()) agg.deserialize(agg.serialize(b)) else b
      })
      // random merge TREE: repeatedly merge two random pool members
      while (pool.size > 1) {
        val a = pool.remove(rnd.nextInt(pool.size))
        val b = pool.remove(rnd.nextInt(pool.size))
        pool += agg.merge(a, b)
      }
      val fin = pool.head
      assert(fin.cnt == n.toLong, s"trial $trial cap $cap")
      assert(fin.vals.length == math.min(n, cap), s"trial $trial cap $cap")
      val got = fin.vals.map(_.asInstanceOf[Long])
      if (n <= cap) assert(got.sorted == values.sorted, s"trial $trial cap $cap")
      // collected values never exceed their input multiplicities
      val inputCounts = values.groupBy(identity).view.mapValues(_.size).toMap
      got.groupBy(identity).foreach { case (v, occ) =>
        assert(occ.size <= inputCounts.getOrElse(v, 0), s"trial $trial value $v")
      }
    }
  }

  test("string elements are copied, not views over a reused row buffer") {
    val df = (1 to 100).map(i => (i % 3L, s"v$i")).toDF("k", "s").repartition(5)
    val got = df.groupBy("k").agg(cappedCollect(col("s"), 200).as("cc"))
      .select(col("k"), col("cc.vals")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expect = (1 to 100).groupBy(_ % 3L).view.mapValues(_.map(i => s"v$i").toSet)
    assert(got == expect.toMap)
  }
}
