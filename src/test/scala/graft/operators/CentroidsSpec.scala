package graft.operators

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CentroidsSpec extends SparkTestBase {
  import spark.implicits._

  test("groupCentroids: element-wise means, counts, null/empty exclusion") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)),
      ("a", Seq(3.0, 4.0)),
      ("b", Seq(10.0, 20.0)),
      ("b", Seq.empty[Double]),
      ("c", null.asInstanceOf[Seq[Double]])
    ).toDF("k", "v")
    val got = Centroids.groupCentroids(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2))).toSeq
      .sortBy(_._1)
    assert(got == Seq(
      ("a", 2L, Seq(2.0, 3.0)),
      ("b", 1L, Seq(10.0, 20.0)))) // empty + null vectors drop; c vanishes
  }

  test("l2Normalize: unit norm, zero-vector and null passthrough") {
    val rows = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0), null)
      .toDF("v").select(Centroids.l2Normalize(col("v")).as("nv")).collect()
    assert(rows(0).getSeq[Double](0) == Seq(0.6, 0.8))
    assert(rows(1).getSeq[Double](0) == Seq(0.0, 0.0))
    assert(rows(2).isNullAt(0))
  }

  private def meanCosine(index: Ivf.IvfIndex, vecs: DataFrame): Double = {
    val cents = index.centroids.grouped(index.dim).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
    Ivf.assign(vecs, "v", index)
      .join(broadcast(cents), "cell")
      .agg(avg(VectorFunctions.cosine(col("v"), col("cvec"))))
      .head.getDouble(0)
  }

  test("refineCentroids: spherical k-means is monotone on real embeddings") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    val initial = Ivf.buildIndex(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding",
      nlist = 8)
    val before = meanCosine(initial, vecs)
    val refined = Ivf.refineCentroids(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "embedding", initial,
      iters = 3)
    val after = meanCosine(refined, vecs)
    // objective: mean cosine to the assigned centroid never degrades
    assert(after >= before - 1e-12, s"before=$before after=$after")
    // and the refinement actually moved the centroids
    assert(!refined.centroids.sameElements(initial.centroids))
    assert(refined.dim == initial.dim && refined.nlist == initial.nlist)
  }
}
