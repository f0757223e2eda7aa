package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows of one hot key + a tail of singletons
  private lazy val skewed = spark.range(10000).select(lit("HOT").as("k"), col("id").as("v"))
    .union(spark.range(100).select(concat(lit("t"), col("id")).as("k"), col("id").as("v")))
    .cache()

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("HOT") == 10000L)
  }

  test("saltedDistinctCount is exact despite salting") {
    val df = skewed.withColumn("v", pmod(col("v"), lit(137))) // 137 distinct under HOT
    val r = Skew.saltedDistinctCount(df, Seq("k"), "v")
      .filter(col("k") === "HOT").collect()(0).getLong(1)
    assert(r == 137L)
  }

  test("saltedJoin matches plain join results") {
    val dim = Seq(("HOT", "hot-dim"), ("t1", "t1-dim")).toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("HOT") == 10000L)
  }
}
