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

  /** Widen a COMPUTE-DENSE stage's input to the cluster's parallelism
    * when the source layout under-parallelizes it. The encode and the
    * cell assignment each expand every input row ncode×/nlist× and
    * push it through the integer-dot kernel — their cost is the
    * expansion, not the scan, so inheriting the scan's partition
    * count from the FILE LAYOUT (a single-row-group parquet ⇒ one
    * task) serializes the one genuinely O(n·m·ncode) step in the
    * family onto a handful of cores. The widening shuffle moves only
    * the n skinny input rows — amortized thousands-fold by the
    * in-task expansion that follows — and is skipped entirely when
    * the source already carries enough partitions (the 100 TB case,
    * where maxPartitionBytes supplies them). Measured at the 10×
    * probe scale (20k vectors in 4 files, 16 cores): index build
    * 13.8–67 s → 5 s steady. Results are partitioning-independent:
    * every argmin is an exact integer min with a total tie order.
    */
  private def widen(df: DataFrame): DataFrame = {
    val have = df.rdd.getNumPartitions
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (have < want) df.repartition(want) else df
  }

  /** Flatten a collected (groupIdx, code/cell, values) codeword table
    * into the kernel's group-major / code-major / element-minor
    * layout. Group indices must be dense 0..groups-1 (pqCodebook's
    * complete grid; centroid cells by construction).
    */
  private def flatten(
      rows: Array[org.apache.spark.sql.Row], groups: Int, nc: Int, sub: Int
  ): Array[Long] = {
    val flat = new Array[Long](groups * nc * sub)
    // grid completeness is ENFORCED, not assumed: a duplicate
    // (group, code) pair masking a missing one would leave an
    // all-zero codeword silently, and pqEncode is a public API
    val seen = new java.util.BitSet(groups * nc)
    rows.foreach { r =>
      val j = r.getInt(0)
      val c = r.getInt(1)
      require(j >= 0 && j < groups && c >= 0 && c < nc,
        s"codeword (group $j, code $c) out of range [$groups, $nc)")
      require(!seen.get(j * nc + c),
        s"duplicate codeword at (group $j, code $c)")
      seen.set(j * nc + c)
      val vs = r.getSeq[Long](2)
      require(vs.length == sub,
        s"codeword length ${vs.length} != $sub at (group $j, code $c)")
      var i = 0
      while (i < sub) { flat((j * nc + c) * sub + i) = vs(i); i += 1 }
    }
    require(seen.cardinality() == groups * nc,
      s"codeword grid incomplete: ${seen.cardinality()} of ${groups * nc} " +
        "(group, code) pairs present")
    flat
  }

  // ---------------------------------------------------------------------
  // Density-adaptive quantizer training (integer Lloyd refinement)
  // ---------------------------------------------------------------------

  /** Integer Lloyd (k-means) refinement of a flat codeword grid — the
    * DENSITY-ADAPTIVE training mode behind [[buildIndex]]'s
    * `refineIters`. The hash-sampled initializers are reproducible but
    * distribution-AGNOSTIC by construction, which the r17 refresh audit
    * measured as its one gap: retraining them on a drifted corpus
    * recovers nothing (union-retrained 22/200 < frozen 29/200 hits —
    * the quantizers never look at density). This refinement is Lloyd's
    * algorithm kept ENTIRELY in exact integer arithmetic so the
    * determinism contract survives training:
    *
    *  - assignment: exact integer squared-L2 argmin over the current
    *    codewords (the [[pqEncode]] kernel — ties → smallest code);
    *  - recenter: per-cluster element sums are exact BIGINTs (order-
    *    independent, map-side combined), the new codeword is the
    *    round-half-up integer mean `floorDiv(2·Σx + n, 2n)` — a pure
    *    function of the sums, partitioning-independent;
    *  - SSE GUARD: the rounded mean is accepted only when it strictly
    *    lowers the cluster's sum of squared distances under the CURRENT
    *    assignment (computable exactly from Σx, Σx² and n — no second
    *    pass), else the old codeword stays. Exact-mean recentering is
    *    monotone; integer ROUNDING could in principle regress a
    *    cluster, and the guard turns "usually improves" into
    *    "non-increasing by construction" (PqSpec pins it). Empty
    *    clusters keep their codeword.
    *
    * Every quantity is a pure integer function of (corpus multiset,
    * init, iters): bit-replayable across engines/partitionings — the
    * committed-golden convention covers refined indexes exactly like
    * hash-sampled ones. Overflow: |x| ≤ 127 ⇒ |Σx| ≤ 127n,
    * Σx² ≤ 127²n, the SSE terms ≤ 3·127²·sub·n — BIGINT-safe to
    * n ≈ 10¹³ vectors per cluster.
    *
    * Plan shape per iteration: ONE corpus pass — the fused encode
    * kernel projects each row to its codes, a bounded explode fans to
    * (group, code, element) and the integer agg map-side-combines to
    * ≤ groups·nc·sub rows per task before the one shuffle; only that
    * plan-constant grid (16k rows at the defaults) is collected. Cost
    * is iters × the encode pass — the documented training price of
    * density adaptation; `refineIters = 0` (the default everywhere)
    * keeps the zero-pass hash-sampled build.
    */
  private def refineFlat(
      qFrame: DataFrame, init: Array[Long],
      groups: Int, nc: Int, sub: Int, iters: Int
  ): Array[Long] = {
    var flat = init.clone()
    for (_ <- 1 to iters) {
      val stats = qFrame
        .select(col("__q"),
          graft.functions.VectorFunctions.pqEncodeCodes(
            col("__q"), flat, groups, nc, sub).as("__codes"))
        .select(posexplode(transform(sequence(lit(0), lit(groups - 1)),
          j => struct(
            element_at(col("__codes"), j + lit(1)).as("code"),
            slice(col("__q"), j * sub + 1, lit(sub)).as("sv")))))
        .select(col("pos").cast(IntegerType).as("g"),
          col("col.code").cast(IntegerType).as("c"), col("col.sv").as("sv"))
        .select(col("g"), col("c"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("g"), col("c"), col("i"))
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
        .collect() // ≤ groups·nc·sub rows — plan-constant
      val sx = new Array[Long](groups * nc * sub)
      val sxx = new Array[Long](groups * nc)
      val n = new Array[Long](groups * nc)
      stats.foreach { r =>
        val g = r.getInt(0); val c = r.getInt(1); val i = r.getInt(2)
        require(g >= 0 && g < groups && c >= 0 && c < nc && i >= 0 && i < sub,
          s"refine stats out of range: (g=$g, c=$c, i=$i)")
        sx((g * nc + c) * sub + i) = r.getLong(3)
        sxx(g * nc + c) += r.getLong(4)
        n(g * nc + c) = r.getLong(5)
      }
      val next = flat.clone()
      var gc = 0
      while (gc < groups * nc) {
        val cnt = n(gc)
        if (cnt > 0) {
          val base = gc * sub
          val cand = new Array[Long](sub)
          var sseOld = sxx(gc)
          var sseCand = sxx(gc)
          var i = 0
          while (i < sub) {
            val s = sx(base + i)
            val cw = flat(base + i)
            val cd = Math.floorDiv(2L * s + cnt, 2L * cnt)
            cand(i) = cd
            sseOld += cnt * cw * cw - 2L * cw * s
            sseCand += cnt * cd * cd - 2L * cd * s
            i += 1
          }
          if (sseCand < sseOld) System.arraycopy(cand, 0, next, base, sub)
        }
        gc += 1
      }
      flat = next
    }
    flat
  }

  /** The corpus's int8-code projection shared by both refinement
    * grids (PQ codebook and coarse quantizer): one column `__q`.
    */
  private def refineInput(
      corpus: DataFrame, vecCol: String
  ): DataFrame =
    widen(corpus).select(
      Similarity.int8Quantize(col(vecCol)).getField("q").as("__q"))

  /** Encode-side SSE of a codeword grid over a corpus — Σ over rows and
    * subspaces of the squared L2 distance to the assigned codeword, in
    * exact BIGINT. The quantization-error instrument PqSpec uses to pin
    * that refinement never regresses the hash-sampled init.
    */
  def gridSse(
      corpus: DataFrame, vecCol: String,
      flat: Array[Long], groups: Int, nc: Int, sub: Int
  ): Long = {
    // one stats pass (the refineFlat shape), SSE assembled driver-side
    // from the exact per-cluster sums: Σx² − 2·cw·Σx + n·|cw|²
    val stats = refineInput(corpus, vecCol)
      .select(col("__q"),
        graft.functions.VectorFunctions.pqEncodeCodes(
          col("__q"), flat, groups, nc, sub).as("__codes"))
      .select(posexplode(transform(sequence(lit(0), lit(groups - 1)),
        j => struct(
          element_at(col("__codes"), j + lit(1)).as("code"),
          slice(col("__q"), j * sub + 1, lit(sub)).as("sv")))))
      .select(col("pos").cast(IntegerType).as("g"),
        col("col.code").cast(IntegerType).as("c"), col("col.sv").as("sv"))
      .select(col("g"), col("c"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col("g"), col("c"), col("i"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        count(lit(1)).as("n"))
      .collect()
    stats.foldLeft(0L) { (acc, r) =>
      val g = r.getInt(0); val c = r.getInt(1); val i = r.getInt(2)
      val cw = flat((g * nc + c) * sub + i)
      acc + r.getLong(4) - 2L * cw * r.getLong(3) + r.getLong(5) * cw * cw
    }
  }

  /** Collected (flat array) view of a local codebook frame plus its
    * grid shape — the refinement entry point shared by buildIndex.
    */
  private def flatCodebook(
      cbRows: Array[org.apache.spark.sql.Row], m: Int
  ): (Array[Long], Int, Int) = {
    val nc = cbRows.length / m
    val sub = cbRows.head.getSeq[Long](2).length
    (flatten(cbRows, m, nc, sub), nc, sub)
  }

  /** Corpus → (id, codes): each vector's m nearest-codeword indices
    * (exact integer squared-L2 per subspace, ties → smallest code;
    * identical winners and ties to the cc − 2·dot form — the dropped
    * sv·sv term is constant within each argmin group). `codes` is
    * ordered by subspace. ONE fused kernel projection per row
    * ([[graft.functions.Kernels.pqEncodeCodes]], codebook shipped as
    * a plan-constant flat array): the inherent O(n·m·ncode) encode
    * arithmetic runs in-row with zero per-candidate allocation. The
    * broadcast-join + min-struct-agg form this replaces materialized
    * one join row per candidate — n·m·ncode rows of array garbage
    * whose GC and cold-JIT behavior made decade-scale builds swing
    * 223–590 s; the fused form holds the same work in a tight loop
    * (sfx100 build ~60 s warm-linear). Subspace width comes from the
    * CODEBOOK (a mixed-dim corpus row is a caller error — the
    * codebook builder validates its sample).
    */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int
  ): DataFrame = {
    val cbRows = codebook.select(col("subspace").cast(IntegerType),
      col("code").cast(IntegerType), col("cw")).collect()
    require(cbRows.nonEmpty, "empty codebook — build it on a non-empty corpus")
    require(cbRows.length % m == 0,
      s"codebook rows ${cbRows.length} not a complete m=$m grid")
    val nc = cbRows.length / m
    val sub = cbRows.head.getSeq[Long](2).length
    val flat = flatten(cbRows, m, nc, sub)
    widen(corpus).select(col(idCol).as("id"),
      graft.functions.VectorFunctions.pqEncodeCodes(
        Similarity.int8Quantize(col(vecCol)).getField("q"),
        flat, m, nc, sub).as("codes"))
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
  /** Collect the codebook once (≤ m×ncode rows — plan-constant, the
    * IVF centroid-collect discipline) and re-seat it as a local frame:
    * the one corpus pass that builds it runs exactly once, every
    * consumer broadcasts the small relation, and nothing is left
    * behind in the cache manager. Returns (codebook, nc) where nc is
    * the actual per-subspace code count (< ncode on a small corpus) —
    * the flat LUT stride.
    */
  private def localCodebook(
      corpus: DataFrame, idCol: String, vecCol: String, m: Int, ncode: Int
  ): (DataFrame, Int) = {
    val built = pqCodebook(corpus, idCol, vecCol, m, ncode)
    val spark = corpus.sparkSession
    val cbRows = built.collect()
    // the Ivf.buildIndex discipline: validate the SAMPLE uniform-dim
    // at collect time (free); a mixed-dim corpus is a caller error —
    // mismatched rows would silently zip-truncate in the encode
    val lens = cbRows.map(_.getSeq[Long](2).length).distinct
    require(lens.length <= 1,
      s"non-uniform embedding dims in the hash sample (codeword lengths " +
        s"${lens.sorted.mkString(",")}) — filter the corpus to one dim first")
    (spark.createDataFrame(
      spark.sparkContext.parallelize(cbRows.toIndexedSeq, 1), built.schema),
      cbRows.length / m)
  }

  /** Per-query flat ADC lookup table: one array of m·nc longs ordered
    * by (subspace, code) — entry [j·nc + c] is dot(query subvector j,
    * codeword c of subspace j). Broadcast-join + sorted collect,
    * BOUNDED at m·nc elements per query.
    */
  private def queryLuts(
      queries: DataFrame, qidCol: String, qvecCol: String,
      codebook: DataFrame, m: Int
  ): DataFrame = {
    val sub = floor(size(col("__q")) / lit(m)).cast(IntegerType)
    queries
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
  }

  /** The in-row ADC fold: m LUT lookups summed in exact BIGINT — the
    * codegen'd [[graft.functions.VectorFunctions.adcLong]] kernel
    * (the serving scan's per-row cost; an interpreted
    * zip_with/aggregate HOF here was the one non-codegen step left in
    * the PQ hot path).
    */
  private def adcScore(codes: Column, lut: Column, m: Int, nc: Int): Column =
    graft.functions.VectorFunctions.adcLong(codes, lut, nc)

  private def rankAdc(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** A built IVF-PQ index — the build-once/serve-many split ([[Ivf]]'s
    * persisted-index shape, in-session): `codebook` and `centroids`
    * are plan-constant local frames (≤ m·ncode and ≤ nlist rows),
    * `encoded` is the corpus as (id, codes, cell) — m bytes of PQ
    * codes plus a cell id per vector, the ONLY data-proportional
    * state. At scale, persist `encoded` `partitionBy("cell")` (the
    * [[Ivf.writeInt8Index]] layout with m-byte payloads) so probes
    * read ~nProbe/nlist of the files.
    */
  final case class PqIndex(
      m: Int, nc: Int, nlist: Int,
      codebook: DataFrame, centroids: DataFrame, encoded: DataFrame)

  /** Build the all-integer IVF-PQ index: PQ codebook (hash-sampled
    * int8 subvectors, [[pqCodebook]]), coarse quantizer (`nlist`
    * hash-sampled FULL int8 code vectors, salt 7 — a routing decision
    * distinct from the codebook's sampling), per-vector PQ codes
    * ([[pqEncode]]) and cells (integer squared-L2 argmin over full
    * codes — the standard L2 coarse quantizer; same cc − 2·dot
    * reduction as pqEncode, ties → smallest cell). Two corpus
    * projections feed one id equi-join; every comparison is
    * BIGINT-exact, so the whole index is bit-replayable in any engine.
    */
  def buildIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ncode: Int, nlist: Int, refineIters: Int = 0
  ): PqIndex = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
    val spark = corpus.sparkSession
    val (codebook0, nc) = localCodebook(corpus, idCol, vecCol, m, ncode)
    // density-adaptive training (refineIters > 0): the hash-sampled
    // grids above stay the INITIALIZERS, and [[refineFlat]] runs
    // integer Lloyd over the corpus — codebook per subspace, coarse
    // quantizer over full codes. Both refined grids remain exact
    // integer tables, so encode/routing/ADC determinism is unchanged.
    val codebook =
      if (refineIters == 0) codebook0
      else {
        val rows = codebook0.collect() // local frame, ≤ m·nc rows
        val (flat, nc2, sub) = flatCodebook(rows, m)
        val refined = refineFlat(refineInput(corpus, vecCol),
          flat, m, nc2, sub, refineIters)
        val outRows = for (g <- 0 until m; c <- 0 until nc2) yield
          org.apache.spark.sql.Row(g, c,
            refined.slice((g * nc2 + c) * sub, (g * nc2 + c + 1) * sub).toSeq)
        spark.createDataFrame(
          spark.sparkContext.parallelize(outRows.toIndexedSeq, 1),
          codebook0.schema)
      }
    val centBuilt = corpus
      .select(col(idCol).as("__id"),
        Similarity.int8Quantize(col(vecCol)).getField("q").as("ccode"))
      .orderBy(Sampling.hashRank(col("__id"), salt = 7L), col("__id"))
      .limit(nlist)
      // bounded unpartitioned window: runs AFTER the limit, ≤ nlist rows
      .withColumn("cell",
        (row_number().over(Window.orderBy(
          Sampling.hashRank(col("__id"), salt = 7L), col("__id"))) - 1)
          .cast(IntegerType))
      .select(col("cell"), col("ccode"),
        intDot(col("ccode"), col("ccode")).as("__cc"))
    val centroids = {
      val rows0 = centBuilt.collect() // ≤ nlist rows — plan-constant
      val rows =
        if (refineIters == 0) rows0.toIndexedSeq
        else {
          val nCells = rows0.length
          val dim = rows0.head.getSeq[Long](1).length
          val flat = new Array[Long](nCells * dim)
          rows0.foreach { r =>
            val cell = r.getInt(0)
            val cc = r.getSeq[Long](1)
            require(cell >= 0 && cell < nCells, s"non-dense cell id $cell")
            require(cc.length == dim,
              s"centroid dim ${cc.length} != $dim at cell $cell")
            var i = 0
            while (i < dim) { flat(cell * dim + i) = cc(i); i += 1 }
          }
          // the coarse grid is one "subspace" spanning the full code
          val refined = refineFlat(refineInput(corpus, vecCol),
            flat, 1, nCells, dim, refineIters)
          (0 until nCells).map { cell =>
            val cc = refined.slice(cell * dim, (cell + 1) * dim)
            org.apache.spark.sql.Row(cell, cc.toSeq,
              cc.foldLeft(0L)((a, v) => a + v * v))
          }
        }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), centBuilt.schema)
    }
    val encoded = encodeAndRoute(corpus, idCol, vecCol, codebook, m, centroids)
    PqIndex(m, nc, nlist, codebook, centroids, encoded)
  }

  /** Corpus → (id, codes, cell) in ONE fused projection: the
    * [[pqEncode]] codes kernel and the coarse-routing kernel (a single
    * "group" spanning the full code — argmin by exact integer
    * squared-L2, ties → smallest cell) over the same quantized row.
    * The encode-join-route composition this replaces evaluated the
    * corpus twice and shuffled BOTH projections into an id equi-join
    * (plus each side's own [[widen]] repartition) — four
    * corpus-proportional exchanges per index build/append for what is
    * a per-row computation. Identical rows: the join was on unique
    * ids, and both kernels are deterministic per-row functions.
    */
  private def encodeAndRoute(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int, centroids: DataFrame
  ): DataFrame = {
    val cbRows = codebook.select(col("subspace").cast(IntegerType),
      col("code").cast(IntegerType), col("cw")).collect()
    require(cbRows.nonEmpty, "empty codebook — build it on a non-empty corpus")
    require(cbRows.length % m == 0,
      s"codebook rows ${cbRows.length} not a complete m=$m grid")
    val nc = cbRows.length / m
    val sub = cbRows.head.getSeq[Long](2).length
    val flatCb = flatten(cbRows, m, nc, sub)
    // the coarse grid is one "group" spanning the full code — reuse
    // flatten's dense-grid/duplicate/length enforcement for it too
    val centRows = centroids
      .select(lit(0).as("grp"), col("cell").cast(IntegerType), col("ccode"))
      .collect()
    require(centRows.nonEmpty, "empty centroid table")
    val dim = centRows.head.getSeq[Long](2).length
    val nCells = centRows.length
    val flatCent = flatten(centRows, 1, nCells, dim)
    widen(corpus).select(
      col(idCol).as("id"),
      graft.functions.VectorFunctions.pqEncodeCodes(
        Similarity.int8Quantize(col(vecCol)).getField("q"),
        flatCb, m, nc, sub).as("codes"),
      element_at(graft.functions.VectorFunctions.pqEncodeCodes(
        Similarity.int8Quantize(col(vecCol)).getField("q"),
        flatCent, 1, nCells, dim), lit(1)).as("cell"))
  }

  /** ADC top-k against a built [[PqIndex]]: per-query top `k` ids by
    * the exact integer PQ score Σⱼ dot(q_subⱼ, codebook[j][codesⱼ]).
    * `nProbe < nlist` routes each query to its nProbe min-L2 cells and
    * scores ONLY those cells' codes (candidate volume ∝ probed-cell
    * occupancy; the broadcast probe join replaces the corpus-wide
    * cross join); `nProbe ≥ nlist` (the default) is the exhaustive
    * flat scan — identical results to scoring everything. Returns
    * (query_id, id, adc_dot, rank), ties by id.
    *
    * Plan: per-query flat LUT (m·nc longs, [[queryLuts]]) → encoded
    * codes crossJoin/probe-join broadcast(queries+LUT) → in-row
    * m-lookup fold → per-query partial WindowGroupLimit. The
    * corpus-side scan touches codes (+cell) only; nothing
    * data-proportional is collected or sorted.
    */
  def adcTopK(
      index: PqIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int = Int.MaxValue
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val luts = queryLuts(queries, qidCol, qvecCol, index.codebook, index.m)
    val candidates =
      if (nProbe >= index.nlist) index.encoded.crossJoin(broadcast(luts))
      else {
        val probed = queries
          .select(col(qidCol).as("query_id"),
            Similarity.int8Quantize(col(qvecCol)).getField("q").as("__q"))
          .crossJoin(broadcast(index.centroids))
          .withColumn("__d",
            col("__cc") - lit(2L) * intDot(col("__q"), col("ccode")))
          .withColumn("__rn",
            row_number().over(Window.partitionBy(col("query_id"))
              .orderBy(col("__d").asc, col("cell").asc)))
          .filter(col("__rn") <= nProbe)
          .select(col("query_id"), col("cell"))
        index.encoded
          .join(broadcast(probed.join(luts, Seq("query_id"))), Seq("cell"))
      }
    rankAdc(candidates
      .select(col("query_id"), col("id"),
        adcScore(col("codes"), col("lut"), index.m, index.nc).as("adc_dot")), k)
  }

  /** One-shot flat PQ-ADC top-k (build + exhaustive serve). Callers
    * serving many query batches should [[buildIndex]] once and
    * [[adcTopK]] repeatedly.
    */
  def pqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      m: Int, ncode: Int, k: Int
  ): DataFrame =
    adcTopK(buildIndex(corpus, idCol, vecCol, m, ncode, nlist = 1),
      queries, qidCol, qvecCol, k)

  /** One-shot IVF-PQ top-k (build + routed serve) — FAISS's IndexIVFPQ
    * shape with zero float comparisons end to end.
    */
  def ivfPqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      m: Int, ncode: Int, nlist: Int, nProbe: Int, k: Int
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= nlist,
      s"nProbe $nProbe out of range for nlist=$nlist")
    adcTopK(buildIndex(corpus, idCol, vecCol, m, ncode, nlist),
      queries, qidCol, qvecCol, k, nProbe)
  }

  // ---------------------------------------------------------------------
  // Persisted IVF-PQ index — the build-once / probe-many serving split
  // ---------------------------------------------------------------------

  /** Index parameters persisted as `meta.txt` beside the data (the
    * [[Ivf.writeInt8Index]] contract): key=value lines. A probe or
    * append against mismatched parameters would score in a silently
    * different space — both validate against this file and fail
    * loudly instead.
    */
  private[operators] final case class PqIndexMeta(
      m: Int, nc: Int, nlist: Int, dim: Int)

  private[operators] object PqIndexMeta {
    private def metaPath(path: String) =
      new org.apache.hadoop.fs.Path(s"$path/meta.txt")

    def write(spark: org.apache.spark.sql.SparkSession, path: String,
        meta: PqIndexMeta): Unit = {
      val p = metaPath(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(p, true)
      try out.write((s"format=ivf_pq\nm=${meta.m}\nnc=${meta.nc}\n" +
        s"nlist=${meta.nlist}\ndim=${meta.dim}\n").getBytes("UTF-8"))
      finally out.close()
    }

    def read(spark: org.apache.spark.sql.SparkSession,
        path: String): Option[PqIndexMeta] = {
      val p = metaPath(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val kv = text.linesIterator.filter(_.contains("="))
          .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
        require(kv.get("format").contains("ivf_pq"),
          s"$p is not an ivf_pq index meta (format=${kv.get("format")})")
        Some(PqIndexMeta(kv("m").toInt, kv("nc").toInt,
          kv("nlist").toInt, kv("dim").toInt))
      }
    }
  }

  /** Write (or grow) the PERSISTED IVF-PQ index — the serving shape of
    * a 100 TB deployment, where the corpus is encoded once per refresh
    * and probed by many query batches that must never pay the encode
    * again. Layout under `path`:
    *
    *  - `cells/`: (id, codes) partitioned by `cell` — the PQ codes,
    *    stored as `array<tinyint>` SHIFTED BY −128 (codes span
    *    0..nc−1 ≤ 255; tinyint is signed, so the shift is the honest
    *    1-byte-per-subspace representation — m bytes per vector, a
    *    32× compression of dim-64 float32 at the defaults; readers
    *    widen back losslessly). One directory per cell → a probe's
    *    `cell IN (...)` predicate prunes the scan to nProbe/nlist of
    *    the files.
    *  - `codebook/`: (subspace, code, cw array<tinyint>) — int8
    *    codeword values are in [-127, 127], no shift needed.
    *  - `centroids/`: (cell, ccode array<tinyint>) — the coarse
    *    quantizer's full int8 code vectors.
    *  - `meta.txt`: m, nc, nlist, dim ([[PqIndexMeta]]).
    *
    * `mode="append"` is the corpus-growth workflow: the increment is
    * encoded under the EXISTING codebook and routed by the EXISTING
    * centroids (read back from disk — fresh quantizers would place old
    * and new vectors in incomparable spaces) and its code rows append
    * to `cells/`; codebook, centroids and meta are untouched. Callers
    * own id disjointness across increments (the
    * [[Dedup.writeMinHashIndex]] contract), and every increment row's
    * dim is validated against the index.
    */
  /** Persist an already-built [[PqIndex]] (fresh builds only — append
    * needs the raw increment, use the corpus form). Callers holding a
    * session-shared index avoid re-paying the encode.
    */
  def writeIndex(index: PqIndex, path: String, mode: String): Unit = {
    require(mode != "append",
      "append needs the raw increment corpus — use the corpus form")
    val spark = index.encoded.sparkSession
    // dim = the coarse quantizer's full-code length (≤ nlist local rows)
    val dim = index.centroids
      .select(size(col("ccode")).as("d")).limit(1).collect()(0).getInt(0)
    // the three dataset writes are independent (disjoint directories,
    // deterministic projections) — overlap them (Actions scaladoc);
    // meta is written strictly AFTER all three, preserving the
    // "meta present ⇒ index complete" reader contract
    Actions.runConcurrently(
      () => index.codebook
        .select(col("subspace"), col("code"),
          col("cw").cast("array<tinyint>").as("cw"))
        .coalesce(1).write.mode(mode).parquet(s"$path/codebook"),
      () => index.centroids
        .select(col("cell"), col("ccode").cast("array<tinyint>").as("ccode"))
        .coalesce(1).write.mode(mode).parquet(s"$path/centroids"),
      () => index.encoded
        .select(col("id"),
          transform(col("codes"), c => (c - lit(128)).cast("tinyint")).as("codes"),
          col("cell"))
        // co-locate cells before the partitioned write (the
        // writeInt8Index discipline): without this every task splits
        // into every cell — tasks × nlist small files at corpus scale
        .repartition(col("cell"))
        .write.mode(mode)
        // a fresh build must REPLACE cells/ wholesale (see writeInt8Index)
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell").parquet(s"$path/cells"))
    PqIndexMeta.write(spark, path, PqIndexMeta(index.m, index.nc, index.nlist, dim))
  }

  def writeIndex(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      m: Int = 8, ncode: Int = 256, nlist: Int = 64, mode: String = "error",
      refineIters: Int = 0
  ): Unit = {
    // append encodes/routes under the PERSISTED quantizers (read back
    // below) — re-training them here would strand the existing codes
    // in a different space; a refresh cycle rebuilds fresh instead
    require(mode != "append" || refineIters == 0,
      "refineIters applies to fresh builds only — append must reuse the " +
        "persisted quantizers (re-encode the union to retrain)")
    if (mode != "append") {
      writeIndex(buildIndex(corpus, idCol, vecCol, m, ncode, nlist,
        refineIters), path, mode)
      return
    }
    val spark = corpus.sparkSession
    val meta = PqIndexMeta.read(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no meta.txt under $path — not a written ivf_pq index"))
    require(meta.m == m && meta.nlist == nlist,
      s"index at $path was built with m=${meta.m}/nlist=${meta.nlist}; " +
        s"cannot append with m=$m/nlist=$nlist")
    appendEncoded(corpus, idCol, vecCol, path, readIndex(spark, path), meta)
  }

  /** The append-mode encode+route+write over ALREADY-READ quantizers —
    * shared by [[writeIndex]]'s append mode and [[ingestBatch]] (which
    * also probed with the same index object and must not pay the
    * codebook/centroid collects twice per fold step).
    */
  private def appendEncoded(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      index: PqIndex, meta: PqIndexMeta
  ): Unit = {
    // every increment row's dim must match (the writeInt8Index
    // guard): short vectors would silently truncate-encode
    val dims = corpus
      .select(size(col(vecCol)).as("d")).filter(col("d") > 0)
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .collect()(0)
    if (!dims.isNullAt(0)) {
      require(dims.getInt(0) == meta.dim && dims.getInt(1) == meta.dim,
        s"increment embedding dims [${dims.getInt(0)}, ${dims.getInt(1)}] " +
          s"!= index dim ${meta.dim} at $path")
    }
    // encode + route the increment under the FROZEN quantizers; codes
    // come from THIS frame's projection, never a re-read of the index
    // (the writeMinHashIndex quadratic-append hazard)
    encodeAndRoute(corpus, idCol, vecCol, index.codebook, index.m,
        index.centroids)
      .select(col("id"),
        transform(col("codes"), c => (c - lit(128)).cast("tinyint")).as("codes"),
        col("cell"))
      .repartition(col("cell"))
      .write.mode("append")
      .partitionBy("cell").parquet(s"$path/cells")
  }

  /** Reconstruct a [[PqIndex]] from a [[writeIndex]] directory: the
    * codebook and centroids collect to plan-constant local frames
    * (≤ m·nc and ≤ nlist rows — never touches `cells/` for this);
    * `encoded` is a LAZY scan of `cells/` with codes widened back
    * (+128) — data-proportional state stays on disk until a probe
    * filters it.
    */
  def readIndex(
      spark: org.apache.spark.sql.SparkSession, path: String
  ): PqIndex = {
    val meta = PqIndexMeta.read(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no meta.txt under $path — not a written ivf_pq index"))
    def localize(df: DataFrame): DataFrame = {
      val rows = df.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), df.schema)
    }
    val codebook = localize(spark.read.parquet(s"$path/codebook")
      .select(col("subspace").cast(IntegerType), col("code").cast(IntegerType),
        col("cw").cast("array<bigint>").as("cw")))
    val centroids = localize(spark.read.parquet(s"$path/centroids")
      .select(col("cell").cast(IntegerType),
        col("ccode").cast("array<bigint>").as("ccode"))
      .withColumn("__cc", intDot(col("ccode"), col("ccode"))))
    val encoded = spark.read.parquet(s"$path/cells")
      .select(col("id"),
        transform(col("codes"), c => (c.cast(IntegerType) + lit(128))).as("codes"),
        col("cell").cast(IntegerType).as("cell"))
    PqIndex(meta.m, meta.nc, meta.nlist, codebook, centroids, encoded)
  }

  /** ADC top-k over a [[writeIndex]] index: route each query with the
    * PERSISTED centroids, scan ONLY the probed cells' code files, rank
    * by the exact integer ADC dot — bit-identical in scores and
    * ranking to an in-session [[ivfPqTopK]] over the same corpus and
    * parameters (same quantizers; integer scoring has no
    * accumulation-order freedom). Partition pruning follows the
    * [[Ivf.ivfTopKFromIndex]] protocol: distinct probe cells
    * (≤ nlist values) collect to the driver for the `cell IN (...)`
    * predicate, and a nondeterministic query frame falls back to an
    * unpruned (correct, full-index) scan — see that scaladoc for the
    * two-evaluation correctness argument.
    *
    * The returned frame reads `cells/` LAZILY: a caller that appends
    * to the index between building this frame and evaluating it would
    * score against the mutated cells (the [[Ivf.ingestAnnBatch]]
    * hazard class) — eagerly materialize (localCheckpoint/collect)
    * before any append, as the ingest folds do.
    */
  /** One step of a SEQUENTIAL PQ-ingest fold at a PRUNED probe — the
    * production streaming-ANN shape ([[Ivf.ingestAnnBatch]] runs the
    * exhaustive-probe variant for its closed-form oracle; THIS is what
    * a deployment actually serves): probe `batch`'s vectors against
    * the persisted IVF-PQ index at `path` with `nProbe` ≪ nlist (top-k
    * ADC neighbors among everything previously SEEN, scanning only the
    * probed cells' code files), then append the batch under the
    * index's FROZEN quantizers, and return the neighbor frame. Drive
    * it from foreachBatch; micro-batches execute strictly in sequence,
    * so batch k retrieves against exactly batches < k.
    *
    * `maxQueries` bounds the RETRIEVAL side of each batch (the
    * [[graft.operators.Sampling.hashRank]]-minima slice, ties by id —
    * the exactAuditMaxQueries convention applied to the fold): the
    * append still ingests the FULL batch, but probe work per batch is
    * capped at maxQueries × probed-cell occupancy instead of growing
    * with batch size — the difference between linear-in-corpus and
    * quadratic when the harness scales batches with the corpus. All
    * arithmetic (routing, ADC) is BIGINT-exact, so the whole fold is
    * closed-form re-derivable by an external oracle — no goldens.
    *
    * EAGER-MATERIALIZE-BEFORE-APPEND + at-least-once replay marker:
    * the [[Ivf.ingestAnnBatch]] disciplines, verbatim — the probe
    * plan reads `cells/` lazily, so the neighbor frame is
    * localCheckpoint'd BEFORE the append (else a late evaluation would
    * score the batch against its own vectors), and a replayed batchId
    * skips the re-append ([[Dedup.LastBatchMarker]]). A replayed probe
    * then sees the batch already in the index: the self-pair would
    * take rank 1, so the probe over-fetches k+1, drops exact id
    * self-pairs, and re-ranks — a singleton batch replays
    * bit-identically.
    */
  def ingestBatch(
      spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
      idCol: String, vecCol: String, path: String,
      k: Int, nProbe: Int = 8, batchId: Option[Long] = None,
      maxQueries: Int = Int.MaxValue
  ): DataFrame = {
    require(maxQueries >= 1, s"maxQueries must be >= 1, got $maxQueries")
    val alreadyIngested = batchId.exists { id =>
      Dedup.LastBatchMarker.read(spark, path).contains(id)
    }
    val queries =
      if (maxQueries == Int.MaxValue) batch
      else batch
        .orderBy(Sampling.hashRank(col(idCol)), col(idCol))
        .limit(maxQueries) // TakeOrderedAndProject — no global sort
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("id").asc)
    // read the frozen quantizer side tables ONCE per fold step: the
    // probe and the append both need them, and each readIndex costs
    // two collect jobs — append mode never touches codebook/centroids,
    // so sharing the read is exact (r18)
    val index = readIndex(spark, path)
    val meta = PqIndexMeta.read(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no meta.txt under $path — not a written ivf_pq index"))
    val neighbors =
      probeIndexWith(index, queries, idCol, vecCol, k + 1, nProbe)
        .filter(col("query_id") =!= col("id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .localCheckpoint()
    if (!alreadyIngested) {
      appendEncoded(batch, idCol, vecCol, path, index, meta)
      batchId.foreach(Dedup.LastBatchMarker.write(spark, path, _))
    }
    neighbors
  }

  def probeIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int = 8
  ): DataFrame =
    probeIndexWith(readIndex(spark, path), queries, qidCol, qvecCol, k, nProbe)

  /** [[probeIndex]] over an already-read [[PqIndex]] — callers probing
    * the same persisted index repeatedly (or probing AND appending in
    * one fold step, [[ingestBatch]]) skip the per-call codebook/
    * centroid collects. The caller owns index/path consistency;
    * `encoded` stays the lazy cells scan, so appends after this call
    * are visible to a late evaluation exactly as with [[probeIndex]].
    */
  def probeIndexWith(
      index: PqIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int = 8
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= index.nlist,
      s"nProbe $nProbe out of range for nlist=${index.nlist}")
    val deterministic = queries.queryExecution.analyzed
      .find(_.expressions.exists(!_.deterministic)).isEmpty
    // nProbe == nlist probes every cell — skip the discovery collect
    // (adcTopK's exhaustive branch never reads the pruning filter)
    val pruned =
      if (deterministic && nProbe < index.nlist) {
        val cells = queries
          .select(col(qidCol).as("query_id"),
            Similarity.int8Quantize(col(qvecCol)).getField("q").as("__q"))
          .crossJoin(broadcast(index.centroids))
          .withColumn("__d",
            col("__cc") - lit(2L) * intDot(col("__q"), col("ccode")))
          .withColumn("__rn",
            row_number().over(Window.partitionBy(col("query_id"))
              .orderBy(col("__d").asc, col("cell").asc)))
          .filter(col("__rn") <= nProbe)
          .select(col("cell")).distinct()
          .collect().map(_.getInt(0)).toSeq // ≤ nlist values
        index.encoded.filter(col("cell").isin(cells: _*))
      } else index.encoded
    adcTopK(index.copy(encoded = pruned), queries, qidCol, qvecCol, k, nProbe)
  }
}
