package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = spark.range(10000)
    .select((col("id") % 1000).as("k"), col("id").as("v"))
  private lazy val dim = spark.range(1000)
    .filter(col("id") % 100 === 0) // 10 of 1000 keys — selective
    .select(col("id").as("dk"), concat(lit("d"), col("id")).as("label"))

  test("semiJoinReduced equals the plain join exactly") {
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select(col("v"), col("label")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val pruned = BloomPrune.semiJoinReduced(fact, "k", dim, "dk",
        expectedItems = 1000)
      .select(col("v"), col("label")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("the prune keeps every matching row and drops most others") {
    val bloom = BloomPrune.build(dim, "dk", expectedItems = 1000)
    val kept = fact.filter(BloomPrune.mightContain(col("k"), bloom)).count()
    val matching = fact.join(dim, fact("k") === dim("dk")).count()
    assert(kept >= matching) // no false negatives, ever
    // 10/1000 true keys at 1% fpp: kept fraction ~ 1% + 1% of rows
    assert(kept < fact.count() / 10, s"prune kept $kept of ${fact.count()}")
  }

  test("string keys probe the same bytes the builder inserted") {
    val sdim = Seq("en", "de").toDF("lang")
    val bloom = BloomPrune.build(sdim, "lang", expectedItems = 100)
    val probed = Seq("en", "de", "fr", "xx").toDF("lang")
      .select(col("lang"), BloomPrune.mightContain(col("lang"), bloom).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed("en") && probed("de"))
    // 2 items in a 100-item-sized filter: fpp is tiny — misses must miss
    assert(!probed("fr") && !probed("xx"))
  }

  test("null keys test definitely-absent, not null") {
    val bloom = BloomPrune.build(dim, "dk", expectedItems = 1000)
    val r = Seq[Option[Long]](Some(0L), None).toDF("k")
      .select(BloomPrune.mightContain(col("k"), bloom).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(r(0) === true)
    assert(r(1) === false)
  }

  test("save/load round-trips the filter bytes") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_spec/f.bloom"
    val bloom = BloomPrune.build(dim, "dk", expectedItems = 1000)
    BloomPrune.save(spark, bloom, path)
    val loaded = BloomPrune.load(spark, path)
    val a = fact.filter(BloomPrune.mightContain(col("k"), bloom))
      .collect().map(_.getLong(1)).sorted.toSeq
    val b = fact.filter(BloomPrune.mightContain(col("k"), loaded))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
