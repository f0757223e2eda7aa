package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * cell-probing alternative to hyperplane LSH ([[Similarity.lshTopK]]).
  *
  * Index structure: a small set of coarse centroids partitions the
  * corpus into cells; each vector is assigned to its nearest centroid.
  * A query probes only its `nProbe` nearest cells and re-ranks the
  * candidates with exact cosine.
  *
  * Scale path (100 TB): centroid assignment is one narrow projection
  * (the centroid table is a plan constant — no join); the assigned
  * corpus is written `partitionBy("cell")` once, so a query's probes
  * touch only nProbe/nlist of the files (partition pruning). Here the
  * cells stay in-memory and the probe is a hash join on the cell id.
  *
  * Centroids are a deterministic hashed sample of the corpus (the k
  * vectors with the smallest xxhash64(id)) — reproducible across runs
  * with no training iterations; a k-means refinement could be layered
  * on without changing the query path.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Double], dim: Int, nlist: Int)

  /** Build the coarse quantizer: k hash-sampled corpus vectors. */
  def buildIndex(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int
  ): IvfIndex = {
    val rows = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .orderBy(xxhash64(col("id")))
      .limit(nlist)
      .collect()
    require(rows.nonEmpty, "empty corpus — cannot build IVF index")
    val dim = rows(0).getSeq[Double](1).length
    val flat = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case (r, i) =>
      val v = r.getSeq[Double](1)
      require(v.length == dim,
        s"non-uniform embedding dim: id=${r.get(0)} has ${v.length}, expected $dim")
      var j = 0
      while (j < dim) { flat(i * dim + j) = v(j); j += 1 }
    }
    IvfIndex(flat, dim, rows.length)
  }

  /** Corpus with its IVF cell id (nearest centroid). At scale, persist
    * this `partitionBy("cell")`.
    */
  def assign(corpus: DataFrame, vecCol: String, index: IvfIndex): DataFrame =
    corpus.withColumn("cell",
      VectorFunctions.nearestCentroids(col(vecCol), index.centroids, index.dim, 1)
        .getItem(0))

  /** Spherical k-means refinement of the coarse quantizer: `iters`
    * Lloyd rounds of assign → recenter. Assignment is the same cosine
    * kernel the query path uses; the recenter step averages
    * L2-NORMALIZED vectors ([[Centroids.l2Normalize]]), whose direction
    * is the argmax of summed cosine for a fixed assignment — so the
    * objective (mean cosine to the assigned centroid) is monotonically
    * non-decreasing, which IvfSpec asserts on real embeddings. Cells
    * that attract no vectors keep their previous centroid.
    *
    * Each round is one distributed assign-and-aggregate pass
    * ([[Centroids.groupCentroids]]: map-side-combined (cell, pos)
    * partial sums); only the nlist×dim centroid table is collected —
    * bounded by index size, never corpus size.
    */
  def refineCentroids(
      corpus: DataFrame, vecCol: String, index: IvfIndex, iters: Int
  ): IvfIndex = {
    var cur = index
    val vecs = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === cur.dim)
      .withColumn("v", Centroids.l2Normalize(col("v")))
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, "v", cur)
      val flat = cur.centroids.clone()
      Centroids.groupCentroids(assigned, "cell", "v")
        .collect() // <= nlist rows, one dim-length array each
        .foreach { r =>
          val cell = r.getInt(0)
          val c = r.getSeq[Double](2)
          var j = 0
          while (j < cur.dim) { flat(cell * cur.dim + j) = c(j); j += 1 }
        }
      cur = IvfIndex(flat, cur.dim, cur.nlist)
    }
    cur
  }

  /** ANN top-k: probe each query's nProbe nearest cells, exact-cosine
    * re-rank within the candidate union. Returns
    * (query_id, id, cosine, rank).
    */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nlist: Int = 64, nProbe: Int = 8
  ): DataFrame = {
    val index = buildIndex(corpus, idCol, vecCol, nlist)
    val assigned = assign(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v", index)
    rankProbes(assigned, queries, qidCol, qvecCol, index, k, nProbe)
  }

  /** IVF routing + INT8 scoring — the composed serving shape of a
    * large ANN deployment: the coarse quantizer narrows each query to
    * `nProbe` cells (candidate volume ∝ probed-cell occupancy, never
    * corpus), then candidates rank by the EXACT 64-bit integer dot of
    * int8 codes ([[Similarity.int8Quantize]] +
    * [[graft.functions.Kernels.dotLong]]) instead of float cosine —
    * at 100 TB the scan reads 4×-compressed codes and touches raw
    * floats never. A corpus vector lives in exactly one cell, so a
    * (query, id) candidate appears at most once even probing many
    * cells — no dedup stage. Scores are bit-deterministic; the
    * routing replays via the committed kernel goldens, which makes
    * the whole composition verifiable (`x_ann_ivf_int8`).
    */
  def ivfInt8TopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nlist: Int = 64, nProbe: Int = 8
  ): DataFrame = {
    val index = buildIndex(corpus, idCol, vecCol, nlist)
    val assigned = assign(
        corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v", index)
      .select(col("id"), col("cell"),
        Similarity.int8Quantize(col("v")).getField("q").as("cq"))
    // two-step select: the analyzer's generator extraction re-resolves
    // sibling expressions against an un-aliased struct (FIELD_NOT_FOUND
    // col1/col2), so the quantized codes are named BEFORE the explode
    val probes = queries
      .select(col(qidCol).as("query_id"),
        Similarity.int8Quantize(col(qvecCol)).getField("q").as("qq"),
        VectorFunctions.nearestCentroids(
          col(qvecCol), index.centroids, index.dim, nProbe).as("__cells"))
      .select(col("query_id"), col("qq"), explode(col("__cells")).as("cell"))
    val candidates = assigned
      .join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.dotLong(col("cq"), col("qq")).as("int_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("int_dot").desc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-space DIVERSITY SAMPLE: at most `perCell` vectors from
    * every IVF cell — the stratified curation step that keeps semantic
    * COVERAGE while cutting volume (a uniform sample over-represents
    * dense regions; sampling per coarse cell keeps the tails). The
    * within-cell pick is the repo's deterministic hash-order idiom
    * (ascending `xxhash64(id)`, ties by id): reproducible across runs
    * and engines, no RNG state, and "random" with respect to any
    * corpus ordering. Returns (cell, pos, id) with pos 1..perCell.
    *
    * Plan shape: centroid build collects ≤ nlist rows; assignment is a
    * narrow projection (the centroid table is a plan constant); the
    * per-cell cut is a `row_number <= perCell` filter that rewrites to
    * a PARTIAL WindowGroupLimit ahead of the exchange — each map task
    * reduces to ≤ perCell rows per cell before shuffling, so the
    * shuffle carries O(cells × perCell × partitions), never the
    * corpus.
    */
  def diversitySample(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 64, perCell: Int = 3
  ): DataFrame = {
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val index = buildIndex(corpus, idCol, vecCol, nlist)
    val assigned = assign(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v", index)
    val w = Window.partitionBy(col("cell"))
      .orderBy(xxhash64(col("id")), col("id"))
    assigned
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= perCell)
      .select(col("cell").cast("long").as("cell"),
        col("pos").cast("int").as("pos"), col("id"))
  }

  /** Persist the assigned corpus partitioned by cell id — the on-disk
    * index layout of the 100 TB path. One directory per cell means a
    * probe's `cell IN (...)` predicate prunes the scan to nProbe/nlist
    * of the files (asserted in IvfSpec).
    */
  def writeIndex(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** ANN top-k over a written index: compute each query's probe cells,
    * then scan ONLY those cells' partitions. Only the DISTINCT probe
    * cells are collected to the driver — at most nlist values, however
    * many queries are in the batch — to build the partition-pruning
    * `cell IN (...)` predicate; the (query, cell) probe frame itself
    * stays a lazy DataFrame on the broadcast side of the join, so a
    * large query batch never materializes queries×nProbe rows as a
    * driver-side Array (the broadcast relation is subject to Spark's
    * broadcast memory accounting instead). The probe projection (a
    * narrow map over the query batch) is evaluated twice — once for the
    * distinct cells, once in the join — which is cheaper than pinning
    * it for the lifetime of the query, but is only CORRECT when the two
    * evaluations agree: if the query frame contains a nondeterministic
    * expression (rand-derived ids, sampling), evaluation #2 could probe
    * a cell the pruning predicate from evaluation #1 never saw, and
    * that query would silently lose candidates. Such frames are
    * detected and probed WITHOUT cell pruning (full index scan —
    * correct, just unpruned). Sources that return different data across
    * two scans (a directory being concurrently rewritten) are not
    * detectable here; snapshot such inputs first.
    */
  def ivfTopKFromIndex(
      spark: SparkSession, indexPath: String, index: IvfIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int = 8
  ): DataFrame = {
    val probeFrame = probeCells(queries, qidCol, qvecCol, index, nProbe)
    val deterministic = queries.queryExecution.analyzed
      .find(_.expressions.exists(!_.deterministic)).isEmpty
    val all = spark.read.parquet(indexPath)
    val corpus =
      if (deterministic) {
        val cells = probeFrame.select(col("cell")).distinct()
          .collect().map(_.getInt(0)).toSeq
        all.filter(col("cell").isin(cells: _*))
      } else all
    rank(corpus.join(broadcast(probeFrame), Seq("cell"))
      .select(col("query_id"), col("id"),
        Similarity.cosine(col("v"), col("qv")).as("cosine")), k)
  }

  private def probeCells(
      queries: DataFrame, qidCol: String, qvecCol: String,
      index: IvfIndex, nProbe: Int
  ): DataFrame =
    queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("qv"))
      .withColumn("cell", explode(
        VectorFunctions.nearestCentroids(col("qv"), index.centroids, index.dim, nProbe)))

  private def rankProbes(
      assigned: DataFrame, queries: DataFrame, qidCol: String, qvecCol: String,
      index: IvfIndex, k: Int, nProbe: Int
  ): DataFrame =
    rank(assigned
      .join(broadcast(probeCells(queries, qidCol, qvecCol, index, nProbe)), Seq("cell"))
      .select(col("query_id"), col("id"),
        Similarity.cosine(col("v"), col("qv")).as("cosine")), k)

  private def rank(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
