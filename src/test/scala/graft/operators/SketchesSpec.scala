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
}
