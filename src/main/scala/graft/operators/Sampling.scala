package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Deterministic corpus splitting and sampling for training-data
  * pipelines (train/val/test splits, per-stratum downsampling).
  *
  * Everything here is a PURE PROJECTION over an id column: no shuffle,
  * no RNG state, no sampling seed to thread through a cluster. The same
  * row lands in the same split on every run, on every engine, at any
  * parallelism — which is what a reproducible training mix needs (a
  * `rand()`-based split changes membership on retry/re-partition, and
  * `df.sample` is seed-deterministic only within one Spark lineage).
  *
  * The bucket hash is two rounds of modular multiplication mod the
  * Mersenne prime 2^31-1, chosen to be portable: every intermediate
  * stays below 2^63, so engines that ERROR on 64-bit overflow (e.g.
  * DuckDB's BIGINT) compute bit-identical buckets to Spark's wrapping
  * arithmetic — that is what lets the driver oracle-check membership
  * exactly. Multiplication mod a prime is a bijection, so structured
  * id spaces (strided, sharded, timestamp-derived, high-bit-tagged)
  * spread across all buckets — unlike a plain `id mod buckets`, which
  * collapses stride-multiple ids into one bucket. It is NOT a
  * cryptographic hash: ids congruent mod 2^31-1 collide by
  * construction, and an adversarial id distribution should pre-hash
  * with xxhash64 (engine-specific, so not oracle-portable).
  *
  * Distinct split/sample DECISIONS over the same corpus must use
  * distinct `salt`s: two decisions with the same salt are perfectly
  * correlated (e.g. a 500-per-mill sample keyed like an 800-per-mill
  * train split selects only train rows). [[withSplit]] and
  * [[stratifiedSample]] default to different salts for exactly this
  * reason.
  */
object Sampling {

  /** Number of hash buckets; fractions are expressed in 1/1000ths. */
  val Buckets = 1000L

  private val P = 2147483647L  // 2^31 - 1, Mersenne prime
  private val A = 1103515245L  // multiplier round 1 (< 2^31)
  private val B = 784588716L   // multiplier round 2 (< 2^31)

  /** Deterministic bucket in [0, Buckets) for a non-null integral id.
    * Overflow audit (the portability contract): r0 < 2^32;
    * r0*A < 2^32 * 2^31 / 2 < 2^63; r1*B < 2^31 * 2^30 < 2^62.
    * Non-negative ids hash identically in Spark (`pmod`) and engines
    * with sign-of-dividend `%`.
    */
  def hashBucket(id: Column, salt: Long = 0L): Column = {
    val r0 = pmod(id, lit(P)) + lit(((salt % P) + P) % P)
    val r1 = pmod(r0 * lit(A), lit(P))
    val r2 = pmod(r1 * lit(B), lit(P))
    pmod(r2, lit(Buckets))
  }

  /** Split label from cumulative per-mill weights, e.g.
    * `Seq("train" -> 800, "val" -> 100, "test" -> 100)`. Weights must
    * sum to [[Buckets]] so every row gets exactly one label.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)], salt: Long = 0L): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(weights.map(_._2).sum == Buckets,
      s"weights must sum to $Buckets per-mill, got ${weights.map(_._2).sum}")
    val b = hashBucket(id, salt)
    val cums = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cums).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cum), rest) => when(b < cum, name).otherwise(rest)
    }
  }

  /** Corpus with a `split` column — the reproducible train/val/test
    * assignment. A filter on `split` stays a codegen'd scan predicate.
    * `split` is a reserved output name: an input that already carries
    * one is rejected rather than silently overwritten.
    */
  def withSplit(
      df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100),
      salt: Long = 0L
  ): DataFrame = {
    require(!df.columns.contains("split"),
      "input already has a column named 'split' (reserved by withSplit)")
    df.withColumn("split", splitLabel(col(idCol), weights, salt))
  }

  /** k-fold cross-validation assignment: deterministic `fold` in
    * [0, k) from the same portable hash family as [[withSplit]],
    * salt-isolated so fold membership is independent of the
    * train/val/test split. Folds are contiguous bucket ranges
    * (`fold = bucket·k div 1000`), as even as the per-mill resolution
    * allows — exactly even when k divides [[Buckets]]. Pure codegen'd
    * projection: no shuffle, no RNG state, reproducible at any
    * parallelism. (floor over the double quotient is exact here:
    * bucket·k ≤ 10⁶ and a quotient can only sit on an integer when
    * the division is itself exact.)
    */
  def withFold(df: DataFrame, idCol: String, k: Int = 5, salt: Long = 3L): DataFrame = {
    require(k >= 2 && k <= Buckets, s"k must be in [2, $Buckets], got $k")
    require(!df.columns.contains("fold"),
      "input already has a column named 'fold' (reserved by withFold)")
    df.withColumn("fold",
      floor((hashBucket(col(idCol), salt) * lit(k.toLong)).cast(DoubleType)
        / lit(Buckets.toDouble)).cast(LongType))
  }

  /** Near-dup-leakage-safe split: every member of a near-dup CLUSTER
    * gets the SAME split label, by hashing the cluster id (component
    * root for paired docs, the row's own id for singletons) instead of
    * the document id. Without this a document lands in train while its
    * near-duplicate lands in test, leaking evaluation signal through
    * paraphrase-level copies — the standard dedup-aware-split
    * requirement for corpus evaluation hygiene. `components` is
    * [[Clusters.connectedComponents]] output over the near-dup pair
    * graph (from any [[Dedup]] operator); it is small relative to the
    * corpus (only pair members), so the join broadcasts and the corpus
    * frame never shuffles — the split itself stays the same portable
    * codegen'd hash projection [[withSplit]] uses.
    */
  def withClusterSafeSplit(
      df: DataFrame, idCol: String, components: DataFrame,
      weights: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100),
      salt: Long = 0L
  ): DataFrame = {
    require(!df.columns.contains("split"),
      "input already has a column named 'split' (reserved by withClusterSafeSplit)")
    require(!df.columns.contains("cluster_id"),
      "input already has a column named 'cluster_id' (reserved by withClusterIds)")
    Clusters.withClusterIds(df, idCol, components)
      .withColumn("split", splitLabel(col("cluster_id"), weights, salt))
  }

  /** Deterministic token-budget sampling: keep documents, in hashed
    * order, until each partition key's running token total reaches the
    * budget — the way training mixes are actually specified ("20B
    * tokens of code, 5B of forum text"), where a doc-count fraction
    * would over/under-shoot with varying doc lengths. The hash order
    * makes the kept set a uniform random-looking sample yet exactly
    * reproducible; the last kept doc may overflow the budget (streaming
    * cutoff — same contract as [[Packing.packBins]]'s final bin).
    *
    * One partitioned window (running sum ordered by bucket, id) —
    * per-key state, no global sort. Distinct decisions need distinct
    * salts, same rule as [[stratifiedSample]].
    */
  def sampleToTokenBudget(
      df: DataFrame, idCol: String, tokenCol: String,
      budgetPerKey: Long, partitionCol: String,
      salt: Long = 2L
  ): DataFrame = {
    require(budgetPerKey > 0, "budgetPerKey must be positive")
    require(!df.columns.contains("__tok_before"),
      "input already has a column named '__tok_before' (reserved scratch)")
    val tok = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok_before", sum(tok).over(w) - tok)
      .filter(col("__tok_before") < budgetPerKey)
      .drop("__tok_before")
  }

  /** Deterministic stratified downsample: keep a per-stratum fraction
    * (per-mill) of rows, decided by the id bucket — no shuffle, no RNG,
    * exact membership reproducibility. Strata absent from `fractions`
    * keep `defaultPerMill` (default: dropped). The default salt differs
    * from [[withSplit]]'s so sampling composes independently with
    * splitting (same salt = perfectly correlated decisions).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Int], defaultPerMill: Int = 0,
      salt: Long = 1L
  ): DataFrame = {
    require((defaultPerMill +: fractions.values.toSeq)
      .forall(f => f >= 0 && f <= Buckets),
      s"per-mill fractions must be in [0, $Buckets]")
    val keep = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultPerMill): Column) {
      case ((stratum, perMill), rest) =>
        when(col(stratumCol) === stratum, perMill).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), salt) < keep)
  }

  /** Temperature-weighted source mixing — the corpus-composition step
    * (the Pile / CCNet α-mixing shape): given a total token budget,
    * allocate it across sources proportionally to `tokens_s^α` with
    * α = 1/2, so small sources are UP-weighted relative to their raw
    * share (α = 1 is proportional sampling, α = 0 is uniform across
    * sources; the square root is the standard middle ground), then keep
    * each source's deterministic per-mill hash slice of documents at
    * the allocated rate. Returns the kept rows plus `rate_mill` (the
    * per-mill keep rate applied to that row's source) so the rate
    * derivation itself is part of the checked output.
    *
    * EVERY step is integer-exact, which is what makes the mix portable
    * and oracle-comparable: `w_s = floor(sqrt(tokens_s))` (exact for
    * `tokens_s < 2^45` — IEEE-correctly-rounded sqrt cannot cross an
    * integer boundary below that), and
    * `rate_mill_s = min(1000, (1000·budget·w_s) div (Σw · tokens_s))`
    * in 64-bit floor division. Overflow audit (same contract as
    * [[hashBucket]]): with `budget ≤ 10^10`, per-source
    * `tokens_s ≤ 10^10`, and ≤ 1000 sources, `w_s ≤ 10^5`, the
    * numerator is ≤ 10^3·10^10·10^5 = 10^18 and the denominator
    * ≤ 10^3·10^5·10^10 = 10^18 — both under 2^63. The per-mill
    * granularity means a source's realized token share tracks its
    * allocation to ~0.1%; when per-source totals exceed 10^10 (a
    * 100 TB corpus counts tokens in the 10^13 range), pre-scale
    * `tokenCol` to a coarser unit (ktokens / Mtokens) — the rate only
    * carries per-mill precision, so the audit bound is a units choice,
    * not a size limit. Production mixes at larger budgets raise
    * [[Buckets]] with the same audit.
    *
    * Scale shape: one small per-source aggregate (|sources| rows), a
    * 1-row total broadcast-crossJoined onto it (the two-pass-agg
    * pattern [[graft.pipeline.ValidationPipeline]] uses for z-scores),
    * and a broadcast join of the per-source rates onto the corpus —
    * the corpus frame itself never shuffles; the keep decision is the
    * same codegen'd hash projection as [[stratifiedSample]].
    */
  def temperatureMix(
      df: DataFrame, idCol: String, tokenCol: String, sourceCol: String,
      budgetTokens: Long, salt: Long = 3L
  ): DataFrame = {
    require(!df.columns.contains("rate_mill"),
      "input already has a column named 'rate_mill' (reserved by temperatureMix)")
    val rates = sourceRates(df, tokenCol, sourceCol, budgetTokens)
      .select(col(sourceCol), col("rate_mill"))
    df.join(broadcast(rates), sourceCol)
      .filter(hashBucket(col(idCol), salt) < col("rate_mill"))
  }

  /** The α=1/2 rate derivation shared by [[temperatureMix]] and
    * [[mixManifest]]: one |sources|-row aggregate + a broadcast 1-row
    * total. Columns: sourceCol, `n_docs`, `src_tokens`, `weight`,
    * `rate_mill`.
    */
  private def sourceRates(
      df: DataFrame, tokenCol: String, sourceCol: String, budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= 10000000000L,
      s"budgetTokens must be in (0, 10^10] (64-bit overflow audit), got $budgetTokens")
    val tok = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val stats = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"), sum(tok).as("src_tokens"))
      .withColumn("weight", floor(sqrt(col("src_tokens"))).cast(LongType))
    // the weight denominator is a single-partition window over the
    // ALREADY-AGGREGATED |sources|-row frame (bounded however large
    // the corpus — the no-unpartitioned-window doctrine applies to
    // data-proportional frames, not this one); the previous separate
    // agg + crossJoin referenced `stats` twice, and Catalyst ran the
    // corpus groupBy once per reference (r18 plan audit).
    // `div` (not `/`): Long / Long is a DOUBLE division in Spark SQL,
    // and the numerator can exceed 2^53 where doubles drop integers
    stats
      .withColumn("__denom",
        sum(col("weight")).over(Window.partitionBy()))
      .withColumn("rate_mill",
        when(col("src_tokens") === 0L || col("__denom") === 0L, 0L)
          .otherwise(least(lit(Buckets),
            expr(s"(1000 * weight * ${budgetTokens}L) div (__denom * src_tokens)"))))
      .drop("__denom")
  }

  /** Source-level mixing MANIFEST — the per-source allocation table
    * every mixing recipe publishes (the Pile / LLaMA "sampling
    * proportion" tables), completing [[temperatureMix]]'s row-level
    * decision with the report you review before running it: per source,
    * the corpus stats the rate was derived from (`n_docs`,
    * `src_tokens`, `weight` = floor(sqrt(tokens))), the applied
    * `rate_mill`, and the REALIZED outcome of the deterministic
    * per-mill hash (`kept_docs`, `kept_tokens`) — realized ≠ target ×
    * tokens in general because membership is decided per document, so
    * the manifest shows the actual kept token mass next to its target.
    * Sources whose rate rounds to zero keep explicit 0 rows (a silent
    * drop is exactly what the report exists to catch).
    *
    * Scale shape: two corpus aggregates (the stats pass and the kept
    * pass — both map-side-combined groupBys on the source key) + the
    * broadcast rate join; output is |sources| rows. Integer-exact end
    * to end, same audit as [[temperatureMix]].
    */
  def mixManifest(
      df: DataFrame, idCol: String, tokenCol: String, sourceCol: String,
      budgetTokens: Long, salt: Long = 3L
  ): DataFrame = {
    val tok = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val rates = sourceRates(df, tokenCol, sourceCol, budgetTokens)
    val kept = df
      .join(broadcast(rates.select(col(sourceCol), col("rate_mill"))), sourceCol)
      .filter(hashBucket(col(idCol), salt) < col("rate_mill"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("kept_docs"), sum(tok).as("kept_tokens"))
    rates
      .join(kept, Seq(sourceCol), "left")
      .na.fill(0L, Seq("kept_docs", "kept_tokens"))
      .select(col(sourceCol), col("n_docs"), col("src_tokens"), col("weight"),
        col("rate_mill"), col("kept_docs"), col("kept_tokens"))
  }

  /** Full-width deterministic hash rank in [0, 2^31-1) — the same
    * two-round LCG as [[hashBucket]] WITHOUT the final per-mill
    * collapse, for decisions that need a total ORDER rather than a
    * keep/drop bucket (per-key sampling order, epoch shuffles). With
    * only 1000 buckets, orderings by [[hashBucket]] would leave ~n/1000
    * adjacent-id runs intact; the 31-bit rank makes collisions rare so
    * the (rank, id) order is a genuine pseudo-shuffle. Same overflow
    * audit and portability contract as [[hashBucket]].
    */
  def hashRank(id: Column, salt: Long = 0L): Column = {
    val r0 = pmod(id, lit(P)) + lit(((salt % P) + P) % P)
    val r1 = pmod(r0 * lit(A), lit(P))
    pmod(r1 * lit(B), lit(P))
  }

  /** Per-key capped deterministic sample: keep at most `k` rows per
    * `keyCol`, chosen by the (hashRank, id) order — the "N examples per
    * source/domain" sampling every corpus audit and eval-set build
    * uses, where an unbiased per-key fraction would over-sample huge
    * keys and starve small ones. Output: input columns + `rn` (1-based
    * position within the key's kept sample — stable, so `rn <= j`
    * nests for j < k).
    *
    * Scale shape: the rank filter sits directly on a key-partitioned
    * row_number window, which Spark rewrites with WindowGroupLimit:
    * each MAP task pre-prunes to its local top-k per key BEFORE the
    * shuffle, so a skewed key moves ≤ k·partitions rows, not its whole
    * volume, and the post-shuffle sort state is ≤ k per key. (A spec
    * pins the WindowGroupLimit node — losing that rewrite would turn
    * hot keys into hot tasks at 100 TB.) Default salt differs from the
    * split/sample/mix salts: distinct decisions, distinct salts.
    */
  def perKeySample(
      df: DataFrame, idCol: String, keyCol: String, k: Int, salt: Long = 4L
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("rn"),
      "input already has a column named 'rn' (reserved by perKeySample)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashRank(col(idCol), salt), col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Round-robin source interleaving — the anti-clumping training
    * order: every source's i-th document comes before ANY source's
    * (i+1)-th, so a batch never sees a long run of one source even
    * when sources are wildly unequal in size (the alternative —
    * concatenate-then-shuffle — still clumps at epoch boundaries and
    * whenever one source dominates). Within each source, position is
    * the per-epoch pseudo-random hash order. Output: idCol, sourceCol,
    * `rn` (0-based position within the source), `pos` (0-based global).
    *
    * Skew-safe by construction: the per-source position is NOT a
    * per-source window (5 sources at 100 TB = 5 hot tasks); it is ONE
    * range-partitioned sort on (source, rank, id) + `zipWithIndex`,
    * with per-source offsets (a |sources|-row count agg, collected and
    * broadcast in the numbering pass) subtracted to turn global
    * indexes into per-source ones. The interleave itself is a second
    * sort on (rn, source) + numbering. Both passes are distributed
    * sorts — no partition ever holds more than its range share.
    */
  def interleaveOrder(
      df: DataFrame, idCol: String, sourceCol: String,
      epoch: Int = 0, saltBase: Long = 300L
  ): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val spark = df.sparkSession
    val rk = hashRank(col(idCol), saltBase + epoch)
    // pass 1: per-source 0-based position via one global sort
    val bySource = df
      .select(col(sourceCol).cast(org.apache.spark.sql.types.StringType)
        .as("src"), col(idCol).cast(LongType).as("id"), rk.as("__rk"))
      .repartitionByRange(col("src"), col("__rk"), col("id"))
      .sortWithinPartitions(col("src"), col("__rk"), col("id"))
      .select(col("src"), col("id"))
    val counts = df.groupBy(col(sourceCol).cast(
        org.apache.spark.sql.types.StringType).as("src"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // source -> rows in lexicographically earlier sources (matches the
    // (src, …) sort order of pass 1)
    val offsets = {
      var acc = 0L
      counts.toSeq.sortBy(_._1).map { case (s, c) =>
        val o = acc; acc += c; s -> o
      }.toMap
    }
    val ranked = spark.createDataFrame(
      bySource.rdd.zipWithIndex().map { case (r, idx) =>
        val src = r.getString(0)
        org.apache.spark.sql.Row(src, r.getLong(1), idx - offsets(src))
      },
      StructType(Seq(
        StructField("src", org.apache.spark.sql.types.StringType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("rn", LongType, nullable = false))))
    // pass 2: interleave — (rn, source) is unique, so the order is total
    val interleaved = ranked
      .repartitionByRange(col("rn"), col("src"))
      .sortWithinPartitions(col("rn"), col("src"))
    val out = spark.createDataFrame(
      interleaved.rdd.zipWithIndex().map { case (r, idx) =>
        org.apache.spark.sql.Row(r.getLong(1), r.getString(0), r.getLong(2), idx)
      },
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("src", org.apache.spark.sql.types.StringType, nullable = false),
        StructField("rn", LongType, nullable = false),
        StructField("pos", LongType, nullable = false))))
    out.withColumnRenamed("id", idCol).withColumnRenamed("src", sourceCol)
  }

  /** Curriculum ordering — easy-first training order with in-band
    * shuffling: rows are banded by the EXACT quantiles of a difficulty
    * column ([[Quantiles.withQuantileBuckets]]: band 1 = easiest
    * quantile, ties down), then globally positioned by (band ASC,
    * epoch hash rank, id) — so training consumes whole difficulty
    * bands in order while each band is internally pseudo-shuffled, and
    * the next epoch re-shuffles within bands without touching the
    * band progression. Output: idCol, `band`, `pos` (0-based global).
    *
    * Null-difficulty rows (null band) order LAST — unknown difficulty
    * trains after everything measured. Same scale shape as
    * [[epochOrder]]: bounded selection passes for the boundaries, then
    * one range-partitioned sort + `zipWithIndex` numbering — no
    * single-task window anywhere.
    */
  def curriculumOrder(
      df: DataFrame, idCol: String, difficultyCol: String,
      nBands: Int = 4, epoch: Int = 0, saltBase: Long = 200L
  ): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val spark = df.sparkSession
    val banded = Quantiles.withQuantileBuckets(df, difficultyCol, nBands,
      outCol = "band")
    val rk = hashRank(col(idCol), saltBase + epoch)
    val sorted = banded
      .select(col(idCol).cast(LongType).as("id"), col("band"), rk.as("__rk"))
      .repartitionByRange(col("band").asc_nulls_last, col("__rk"), col("id"))
      .sortWithinPartitions(col("band").asc_nulls_last, col("__rk"), col("id"))
      .select(col("id"), col("band"))
    val out = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, idx) =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"curriculumOrder: null $idCol — ids must be non-null")
        org.apache.spark.sql.Row(r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1), idx)
      },
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("band", LongType, nullable = true),
        StructField("pos", LongType, nullable = false))))
    out.withColumnRenamed("id", idCol)
  }

  /** Deterministic epoch shuffle: the corpus in the pseudo-random
    * (hashRank(id, saltBase + epoch), id) order with a GLOBAL 0-based
    * `pos` — the reproducible training-order primitive (same epoch →
    * bit-identical order on any cluster layout; next epoch → a fresh
    * decorrelated permutation, no RNG state to checkpoint). Output:
    * idCol, `pos`.
    *
    * Scale shape: a range-partitioned distributed sort on the hash
    * rank + `zipWithIndex` for global positions (one count job + one
    * pass — the [[Packing]] numbering idiom; `row_number() OVER
    * (ORDER BY …)` would funnel 100 TB through one task's window).
    * Null ids are rejected loudly — a null would silently sort into
    * one position and break the permutation contract.
    */
  def epochOrder(
      df: DataFrame, idCol: String, epoch: Int, saltBase: Long = 100L
  ): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val spark = df.sparkSession
    val rk = hashRank(col(idCol), saltBase + epoch)
    val sorted = df
      .select(col(idCol).cast(LongType).as("id"), rk.as("__rk"))
      .repartitionByRange(col("__rk"), col("id"))
      .sortWithinPartitions(col("__rk"), col("id"))
      .select(col("id"))
    val out = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, idx) =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"epochOrder: null $idCol — ids must be non-null")
        org.apache.spark.sql.Row(r.getLong(0), idx)
      },
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("pos", LongType, nullable = false))))
    out.withColumnRenamed("id", idCol)
  }
}
