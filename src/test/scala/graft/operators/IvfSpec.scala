package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv")).cache()

  test("index build is deterministic and well-shaped") {
    val a = Ivf.buildIndex(emb, "vec_id", "embedding", 32)
    val b = Ivf.buildIndex(emb, "vec_id", "embedding", 32)
    assert(a.centroids.toSeq == b.centroids.toSeq)
    assert(a.dim == 64)
    assert(a.nlist == 32)
  }

  test("cell assignment covers the corpus with bounded cells") {
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", 32)
    val assigned = Ivf.assign(
      emb.select(col("vec_id").as("id"), col("embedding").as("v")), "v", index)
    assert(assigned.count() == 500)
    val cells = assigned.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 32))
    assert(cells.length > 8) // sampled centroids spread the corpus
  }

  test("ivfTopK finds the self-match and achieves reasonable recall") {
    val exact = Similarity.batchTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 10, nlist = 32, nProbe = 8)
    val approxSet = approx.select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query probes its own cell -> always finds itself
    assert((0L until 5L).forall(q => approxSet.contains((q, q))))
    val recall = (exact intersect approxSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
    // candidates are a strict subset of the corpus -> fewer exact
    // comparisons than brute force
    assert(approx.count() <= 50)
  }
}
