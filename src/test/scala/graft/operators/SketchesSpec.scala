package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val base = s"${System.getProperty("java.io.tmpdir")}/graft_sketches_spec"

  private lazy val data = spark.range(20000)
    .select((col("id") % 3).cast("string").as("grp"),
      // ~2000 distinct values per group, heavily repeated
      concat(lit("v"), (col("id") % 2000)).as("v"),
      col("id"))

  test("unioned increments estimate the cross-increment distinct count") {
    Sketches.writeHllSketches(data.filter(col("id") % 2 === 0),
      Seq("grp"), "v", s"$base/a", mode = "overwrite")
    Sketches.writeHllSketches(data.filter(col("id") % 2 === 1),
      Seq("grp"), "v", s"$base/b", mode = "overwrite")
    val est = Sketches.unionHllEstimates(spark, Seq(s"$base/a", s"$base/b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy("grp").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n).toDouble / n <= 0.05, s"grp $g: est $e vs exact $n")
    }
  }

  test("overlapping increments do not double count") {
    // both increments contain the SAME values — union must estimate
    // the set size, not the sum of increment sizes
    Sketches.writeHllSketches(data, Seq("grp"), "v", s"$base/full1", mode = "overwrite")
    Sketches.writeHllSketches(data, Seq("grp"), "v", s"$base/full2", mode = "overwrite")
    val once = Sketches.unionHllEstimates(spark, Seq(s"$base/full1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twice = Sketches.unionHllEstimates(spark, Seq(s"$base/full1", s"$base/full2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == twice)
  }

  test("union is order-invariant (deterministic estimates)") {
    Sketches.writeHllSketches(data.filter(col("id") % 2 === 0),
      Seq("grp"), "v", s"$base/a", mode = "overwrite")
    Sketches.writeHllSketches(data.filter(col("id") % 2 === 1),
      Seq("grp"), "v", s"$base/b", mode = "overwrite")
    val ab = Sketches.unionHllEstimates(spark, Seq(s"$base/a", s"$base/b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ba = Sketches.unionHllEstimates(spark, Seq(s"$base/b", s"$base/a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ab == ba)
  }

  // keys with a skewed repetition profile: key k appears k+1 times
  private lazy val cmKeys = spark.range(200)
    .select(explode(sequence(lit(0), col("id"))).as("__i"), col("id").as("k"))
    .select(col("k"))

  test("count-min: estimate >= exact for EVERY key; matches a Scala replay") {
    val sketch = Sketches.countMinSketch(cmKeys, "k", width = 64, depth = 4)
    val exact = cmKeys.groupBy("k").agg(count(lit(1)).as("n"))
    val est = Sketches.countMinLookup(sketch, exact, "k", width = 64, depth = 4)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"), r.getAs[Long]("cms_est")))
    assert(est.length == 200)
    est.foreach { case (k, n, e) => assert(e >= n, s"key $k: est $e < exact $n") }

    // replay the sketch arithmetic in plain Scala — same hash family
    val P = 2147483647L; val A = 1103515245L; val B = 784588716L
    def cell(k: Long, salt: Long): Int = ((((k % P) + salt) * A % P) * B % P % 64).toInt
    val counts = (0L until 200L).flatMap(k => Seq.fill((k + 1).toInt)(k))
    val table = Array.fill(4, 64)(0L)
    for (k <- counts; r <- 0 until 4) table(r)(cell(k, 21L + r)) += 1
    est.foreach { case (k, _, e) =>
      val want = (0 until 4).map(r => table(r)(cell(k, 21L + r))).min
      assert(e == want, s"key $k: est $e != replay $want")
    }
  }

  test("count-min: linear merge — summed increment sketches equal the full build") {
    val a = Sketches.countMinSketch(cmKeys.filter(col("k") % 2 === 0), "k", 64, 4)
    val b = Sketches.countMinSketch(cmKeys.filter(col("k") % 2 === 1), "k", 64, 4)
    val merged = a.unionByName(b).groupBy("r", "cell").agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getAs[Int]("r"), r.getAs[Int]("cell")) -> r.getAs[Long]("c")).toMap
    val full = Sketches.countMinSketch(cmKeys, "k", 64, 4)
      .collect().map(r => (r.getAs[Int]("r"), r.getAs[Int]("cell")) -> r.getAs[Long]("c")).toMap
    assert(merged == full)
  }

  test("count-min: a never-seen key probing only empty cells estimates zero") {
    // width 1024 >> 200 keys: some key far outside the domain lands in
    // at least one empty cell with near-certainty; assert the stronger
    // invariant est(k) == min over k's cells (0 when all-empty)
    val sketch = Sketches.countMinSketch(cmKeys, "k", width = 1024, depth = 4)
    val probe = Seq(987654321L).toDF("k")
    val got = Sketches.countMinLookup(sketch, probe, "k", 1024, 4)
      .collect().map(r => r.getAs[Long]("cms_est")).head
    val P = 2147483647L; val A = 1103515245L; val B = 784588716L
    def cell(k: Long, salt: Long): Int = ((((k % P) + salt) * A % P) * B % P % 1024).toInt
    val counts = (0L until 200L).flatMap(k => Seq.fill((k + 1).toInt)(k))
    val table = Array.fill(4, 1024)(0L)
    for (k <- counts; r <- 0 until 4) table(r)(cell(k, 21L + r)) += 1
    val want = (0 until 4).map(r => table(r)(cell(987654321L, 21L + r))).min
    assert(got == want)
  }
}
