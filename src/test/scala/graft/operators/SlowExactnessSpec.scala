package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf0.1 exactness regeneration for the seven catalog entries whose
  * DuckDB oracles are all-pairs-quadratic and therefore run only at
  * sf0.01 in the driver gate (`x_dedup_minhash`, `x_dedup_ngram`,
  * `x_dedup_clusters`, `x_dedup_incremental`, `x_incremental_ingest`,
  * `x_corpus_prep`, `x_cluster_safe_split`). Their sf0.1 claims (BASELINE.md: LSH pair set ==
  * exact set 256/256; index-probe set == cross-subset restriction
  * 89/89) were hand-verified in r4/r6; this suite regenerates them
  * mechanically every time it runs, so the claim can never go stale
  * against the code.
  *
  * The ground truth is a SPARK-side brute force: all ~12.5M ordered doc
  * pairs through the exact-jaccard kernel via a broadcast nested-loop
  * cross join — quadratic, which is exactly why DuckDB can't oracle it
  * at this SF (>90 s/query there), but a one-minute job for Spark at
  * 5000 docs. Brute force shares ONLY the `shingles`/`jaccard` kernels
  * with the operators under test (kernel exactness is pinned separately
  * in VectorExpressionsSpec against JVM-set recomputes); none of the
  * candidate-generation machinery being validated — banding, prefix
  * filter, size-ratio prune, posting caps, index layout — is on the
  * brute-force path.
  *
  * GATED: runs only with SPARK_GRAFT_SLOW=1 (and sf0.1 testdata
  * present); otherwise every test cancels. ~2-3 min on the shared
  * local[4] test session.
  */
class SlowExactnessSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.1"

  private def gate(): Unit = {
    assume(sys.env.get("SPARK_GRAFT_SLOW").contains("1"),
      "slow sf0.1 exactness suite — set SPARK_GRAFT_SLOW=1 to run")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sf01)),
      s"$sf01 testdata not present")
  }

  private lazy val docs: DataFrame =
    spark.read.parquet(s"$sf01/documents.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Exact all-pairs (id_a < id_b, jaccard >= 0.5) over sf0.1 documents
    * — the ground-truth set, computed once per JVM.
    */
  private lazy val brutePairs: Map[(Long, Long), Double] = {
    val sh = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(broadcast(
        sh.select(col("id").as("id_b"), col("sh").as("sh_b"))))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("sf0.1: MinHash-LSH pair set equals the exact all-pairs set (the 256/256 claim)") {
    gate()
    val lsh = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
    assert(pairSet(lsh) == brutePairs.keySet)
    assert(brutePairs.size == 256, "documented sf0.1 exact-pair count")
  }

  test("sf0.1: exact n-gram Jaccard pair set and values equal brute force") {
    gate()
    val got = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == brutePairs) // ids AND the kernel-computed jaccard doubles
  }

  test("sf0.1: corpus-prep's threshold-0.8 LSH stage equals the exact >=0.8 subset") {
    gate()
    val lsh08 = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)
    // NOT `.collect { case (ids, j) if ... => ids }.toSet`: collect on a
    // Map whose result type is a Tuple2 rebuilds a MAP, silently
    // collapsing pairs that share id_a before toSet runs
    assert(pairSet(lsh08) == brutePairs.filter(_._2 >= 0.8).keySet)
  }

  /** Independent driver-side union-find with min-id roots over the
    * brute-force pair set — ground truth for the components test AND
    * the cluster-safe-split test (pair members only; singletons are
    * absent and root themselves).
    */
  private lazy val bruteComponents: Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    brutePairs.keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("sf0.1: connected components over near-dup pairs match union-find on the exact set") {
    gate()
    val got = Clusters.connectedComponents(
      Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteComponents)
  }

  test("sf0.1: cluster-safe split labels every member with its root's replayed hash bucket") {
    gate()
    val comps = Clusters.connectedComponents(
      Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.5))
    val got = Sampling.withClusterSafeSplit(docs, "doc_id", comps)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // driver-side replay of the portable bucket hash (the same
    // arithmetic the DuckDB oracle SQL spells out, reimplemented here
    // rather than calling Sampling.hashBucket)
    val (p, a, b) = (2147483647L, 1103515245L, 784588716L)
    def label(id: Long): String = {
      val r2 = (((id % p) * a % p) * b % p) % 1000L
      if (r2 < 800) "train" else if (r2 < 900) "val" else "test"
    }
    val allIds = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.keySet == allIds, "split output must cover the whole corpus")
    allIds.foreach { id =>
      val root = bruteComponents.getOrElse(id, id)
      assert(got(id) == ((root, label(root))),
        s"doc $id: expected root $root label ${label(root)}, got ${got(id)}")
    }
  }

  test("sf0.1: index-probe pair set equals the brute-force cross-subset restriction (the 89/89 claim)") {
    gate()
    // mirror of Queries.indexAndProbe: 4/5 corpus indexed, 1/5 probed
    val idxPath = s"${System.getProperty("java.io.tmpdir")}/graft_slow_exact_idx"
    Dedup.writeMinHashIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
      idxPath, mode = "overwrite")
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val probe = Dedup.minHashProbeIndex(spark, batch, "doc_id", "text",
      idxPath, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // expected: exact pairs with EXACTLY one side in the batch,
    // reoriented to (batch_id, corpus_id)
    val expect = brutePairs.collect {
      case ((a, b), j) if (a % 5 == 0) != (b % 5 == 0) =>
        (if (a % 5 == 0) (a, b) else (b, a)) -> j
    }
    assert(probe == expect)
    assert(expect.size == 89, "documented sf0.1 cross-subset pair count")

    // and the ingest composition's novelty stage: survivors are exactly
    // the batch ids that hit no indexed near-dup
    val novel = Dedup.keepNovel(batch, "doc_id",
      spark.createDataFrame(spark.sparkContext.parallelize(
        probe.keys.toSeq.map(p => org.apache.spark.sql.Row(p._1, p._2))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("corpus_id",
            org.apache.spark.sql.types.LongType)))))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val batchIds = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(novel == batchIds -- probe.keys.map(_._1))
  }
}
