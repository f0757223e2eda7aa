package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Product quantization (PQ) — the third rung of the embedding
  * compression ladder (float32 → int8 → PQ codes) and the standard
  * billion-vector serving representation (IVF-PQ is the FAISS
  * workhorse; Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * The vector is split into `m` contiguous subvectors; each subspace
  * gets its own `ncode`-entry codebook, and a vector is stored as its
  * m nearest-codeword indices — m bytes at ncode=256, a 32×
  * compression of a dim-64 float32 embedding (vs int8's 4×). Queries
  * score documents WITHOUT decompressing: one m×ncode table of
  * query-subvector × codeword dots per query (ADC — asymmetric
  * distance computation), then a document's score is m table lookups
  * summed.
  *
  * DETERMINISM (what makes this family DuckDB-oracle-exact, unlike
  * classic k-means-trained PQ): codewords are the int8-quantized
  * subvectors of the `ncode` corpus vectors with the smallest
  * `(Sampling.hashRank(id), id)` — the repo's hash-order sampling
  * idiom (the [[Ivf]] coarse-quantizer trick, per subspace). Encoding
  * minimizes the exact INTEGER squared L2 distance between int8
  * subvectors (ties → smallest codeword index), and ADC scores are
  * exact 64-bit integer sums of int8 dots — no float accumulates
  * anywhere past the per-element quantization floor, so codebook,
  * codes, and ranking are all bit-replayable in any engine.
  * Overflow audit: |q|≤127 ⇒ a squared-diff term ≤ 254², a sub-dot
  * ≤ 127²·(dim/m), a score ≤ 127²·dim < 2^21 — BIGINT everywhere.
  *
  * Scale shape (100 TB): the codebook is m×ncode rows (2048 at the
  * defaults) — a plan constant, broadcast everywhere it appears.
  * Encoding is one corpus scan with a per-row m×ncode argmin (the
  * inherent O(n·m·ncode) PQ encode cost) whose pair expansion
  * collapses map-side: the subspace explode and codebook join happen
  * within a task and the (id, subspace) min-struct agg combines
  * before any shuffle, so the shuffle carries n·m skinny rows, never
  * n·m·ncode. Serving scans CODES ONLY (m bytes/vector); per-query
  * LUTs are ncode·m longs built from the broadcast codebook, and the
  * score fold is an in-row `aggregate` over m lookups — the int8TopK
  * plan shape with 8× narrower corpus payload.
  */
object Pq {

  /** Deterministic PQ codebook: (subspace, code, cw) where `cw` is the
    * int8-quantized subvector (length dim/m, BIGINT elements) of the
    * `code`-th hash-sampled corpus vector. Every sampled vector
    * contributes one codeword to EVERY subspace, so the (subspace,
    * code) grid is complete — the flat-LUT indexing in [[pqTopK]]
    * relies on that. If the corpus has fewer than `ncode` vectors the
    * codebook holds all of them (codes stay dense 0..n-1).
    */
  def pqCodebook(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ncode: Int
  ): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ncode >= 1, s"ncode must be >= 1, got $ncode")
    val sampled = corpus
      .select(col(idCol).as("__id"),
        Similarity.int8Quantize(col(vecCol)).getField("q").as("__q"))
      .orderBy(Sampling.hashRank(col("__id")), col("__id"))
      .limit(ncode) // TakeOrderedAndProject — no global sort
      // the unpartitioned window runs AFTER the limit, on ≤ ncode rows
      // — plan-constant-bounded, never data-proportional
      .withColumn("code",
        (row_number().over(Window.orderBy(
          Sampling.hashRank(col("__id")), col("__id"))) - 1).cast(IntegerType))
    val sub = floor(size(col("__q")) / lit(m)).cast(IntegerType)
    sampled
      .select(col("code"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__q"), j * sub + 1, sub))))
      .select(col("pos").cast(IntegerType).as("subspace"), col("code"),
        col("col").as("cw"))
  }

  /** Exact integer dot between two BIGINT arrays — the codegen'd
    * kernel ([[graft.functions.VectorFunctions.dotLong]]); the
    * interpreted zip_with/aggregate HOF form was ~5× slower on the
    * encode's n·m·ncode hot loop.
    */
  private def intDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotLong(a, b)

  /** Corpus → (id, codes): each vector's m nearest-codeword indices
    * (exact integer L2 in each subspace, ties → smallest code).
    * `codes` is ordered by subspace. One corpus scan; the m·ncode
    * candidate expansion is map-local (broadcast codebook join +
    * map-side-combined min-struct agg), so the one shuffle carries
    * n·m rows of (id, subspace, best) structs.
    */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int
  ): DataFrame = {
    val sub = floor(size(col("__q")) / lit(m)).cast(IntegerType)
    corpus
      .select(col(idCol).as("id"),
        Similarity.int8Quantize(col(vecCol)).getField("q").as("__q"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__q"), j * sub + 1, sub))))
      .withColumnRenamed("pos", "subspace")
      .join(broadcast(codebook
        .withColumn("__cc", intDot(col("cw"), col("cw")))), Seq("subspace"))
      // argmin over ‖sv−cw‖² = argmin over (cw·cw − 2·sv·cw): the
      // per-(doc, subspace) term sv·sv is constant inside each argmin
      // group, so dropping it changes NO winner and NO tie — and the
      // whole hot loop stays in the codegen'd dotLong kernel
      .groupBy(col("id"), col("subspace"))
      .agg(min(struct(
        (col("__cc") - lit(2L) * intDot(col("col"), col("cw"))).as("d"),
        col("code").as("c"))).as("best"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(
          struct(col("subspace"), col("best.c").as("c")))),
        s => s.getField("c")).as("codes"))
  }

  /** ADC top-k: per-query top `k` documents by the exact integer PQ
    * score Σⱼ dot(q_subⱼ, codebook[j][codesⱼ]). Returns
    * (query_id, id, adc_dot, rank), ties by id.
    *
    * Plan: codebook (m×ncode rows, plan-bounded) → per-query flat LUT
    * (one array of m·ncode longs, built by a broadcast join + sorted
    * collect, BOUNDED by m·ncode per query) → encoded corpus
    * crossJoin broadcast(queries+LUT) → in-row m-lookup fold →
    * per-query partial WindowGroupLimit. The corpus-side scan touches
    * codes only; nothing data-proportional is collected or sorted.
    */
  def pqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      m: Int, ncode: Int, k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // collect the codebook once (≤ m×ncode rows — plan-constant, the
    // IVF centroid-collect discipline) and re-seat it as a local frame:
    // the one corpus pass that builds it runs exactly once, both
    // consumers below broadcast the small relation, and nothing is left
    // behind in the cache manager. The row count also fixes the flat
    // LUT stride (< ncode codes on a small corpus).
    val built = pqCodebook(corpus, idCol, vecCol, m, ncode)
    val spark = corpus.sparkSession
    val cbRows = built.collect()
    val codebook = spark.createDataFrame(
      spark.sparkContext.parallelize(cbRows.toIndexedSeq, 1), built.schema)
    val nc = cbRows.length / m
    val encoded = pqEncode(corpus, idCol, vecCol, codebook, m)
    val sub = floor(size(col("__q")) / lit(m)).cast(IntegerType)
    val luts = queries
      .select(col(qidCol).as("query_id"),
        Similarity.int8Quantize(col(qvecCol)).getField("q").as("__q"))
      .select(col("query_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__q"), j * sub + 1, sub))))
      .withColumnRenamed("pos", "subspace")
      .join(broadcast(codebook), Seq("subspace"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(
          col("subspace"), col("code"),
          intDot(col("col"), col("cw")).as("d")))),
        s => s.getField("d")).as("lut"))
    val scored = encoded.crossJoin(broadcast(luts))
      .select(col("query_id"), col("id"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, j) => element_at(col("lut"),
              (j * nc + c + 1).cast(IntegerType))),
          lit(0L), (acc, x) => acc + x).as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
