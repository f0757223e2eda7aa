package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale text corpora.
  *
  * Generalizes the reference's only cross-row operator — the global
  * duplicate_check (reference src/data_validator.py:204-226) — to the
  * dedup family a training-data pipeline needs: exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. All are expressed as declarative plans:
  * the candidate-generation stages are hash-partitioned `groupBy`s
  * (one shuffle each), and near-dup verification only ever runs on
  * WITHIN-BUCKET candidate pairs — there is no all-pairs self-join
  * anywhere, so the plans survive a 100 TB corpus (cost is bounded by
  * bucket skew, not corpus size squared).
  */
object Dedup {

  // ---------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------

  /** Exact dedup on arbitrary key columns: keep the lowest-id row per
    * group. One hash shuffle on (keys); map-side partial aggregation
    * applies since min() is an algebraic agg.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Groups of exact duplicates (group key + member count), for audit.
    * Hashing the key columns first (xxhash64) keeps the shuffle rows
    * narrow when key columns are wide text.
    */
  def exactDupGroups(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  // ---------------------------------------------------------------------
  // Shingling + MinHash
  // ---------------------------------------------------------------------

  /** Token n-gram shingles of a text column, as a deduplicated array.
    * Pure codegen'd expressions: split → sliding windows via transform
    * over an index sequence → distinct.
    */
  def shingles(text: Column, n: Int): Column = {
    val tokens = split(trim(text), "\\s+")
    // guard: sequence(1, k) needs k >= 1 — docs shorter than n tokens
    // have zero shingles (empty array, NOT a descending sequence)
    when(size(tokens) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))
        )
      )
    ).otherwise(array().cast(ArrayType(StringType)))
  }

  /** MinHash signature (length = numHashes) over a shingle array.
    * hash_i(s) = xxhash64(i, s); signature[i] = min over shingles.
    * All codegen'd (`transform` + `array_min` + `xxhash64`) — no UDF,
    * no explode: the signature is computed in a single projection.
    */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    array(
      (0 until numHashes).map(i =>
        array_min(transform(shingleArr, s => xxhash64(lit(i), s)))): _*)

  /** LSH band keys from a MinHash signature: `bands` buckets, each
    * hashing `numHashes / bands` consecutive signature entries. Docs
    * agreeing on ANY band land in the same bucket.
    */
  def lshBands(signature: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array(
      (0 until bands).map(b =>
        struct(
          lit(b).as("band"),
          xxhash64(concat_ws("|", slice(signature, b * rows + 1, rows)))
            .as("bucket"))): _*)
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(array_union(a, b)).cast(DoubleType)
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** MinHash + LSH near-duplicate pairs over a text column.
    *
    * Plan shape: project(shingles, signature, bands) → explode bands →
    * ONE shuffle on (band, bucket) → within-bucket id-ordered pairs →
    * distinct candidate pairs → verify with exact Jaccard on the shingle
    * sets (second shuffle to re-attach shingles). Candidate count is
    * O(sum over buckets of |bucket|²) — bounded by LSH collision
    * probability, never corpus². `maxBucket` caps pathological buckets
    * (e.g. the empty-string doc cluster) so one hot key cannot quadratic
    * the job; dropped buckets are all-identical-signature groups that
    * exact dedup already catches.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minHashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): DataFrame = {
    val withShingles = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleSize))
      .filter(size(col("sh")) > 0)
    val sigs = withShingles
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        explode(lshBands(col("sig"), numHashes, bands)).as("bk"))

    // within-bucket candidate pairs (id-ordered to halve + dedup)
    val buckets = sigs
      .groupBy(col("bk.band"), col("bk.bucket"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    val pairs = buckets
      .select(explode(pairCombinations(col("members"))).as("p"))
      .select(
        col("p.a.id").as("id_a"), col("p.a.sh").as("sh_a"),
        col("p.b.id").as("id_b"), col("p.b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** All ordered pairs (a.id < b.id) from an array of member structs,
    * built with codegen'd higher-order functions (flatten of per-element
    * suffix pairings) — avoids a UDF and keeps the quadratic work inside
    * one task per bucket (bounded by maxBucket).
    */
  private def pairCombinations(members: Column): Column = {
    val sorted = array_sort(members) // struct sort: by id then sh
    flatten(
      transform(sorted, (m, i) =>
        transform(slice(sorted, i + 2, size(sorted)), other =>
          struct(m.as("a"), other.as("b")))))
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash of a token array: per bit, sum +1/-1 votes across
    * token hashes; bit set where the vote is positive. Expressed as a
    * fold (`aggregate`) over the tokens producing a 64-long vote vector,
    * then a second pass packs the sign bits — all codegen'd, no shuffle.
    */
  def simHash(tokens: Column): Column = {
    val votes = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        transform(acc, (v, i) =>
          v + when(call_function("getbit", h, i) === 1, 1L).otherwise(-1L))
      }
    )
    aggregate(
      transform(votes, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit)
    )
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance <= maxDistance.
    * Pigeonhole bucketing: split the 64-bit hash into (maxDistance+1)
    * blocks; any pair within distance d agrees exactly on >= 1 block, so
    * grouping by (block index, block value) finds all candidates with
    * ONE shuffle — no all-pairs join. Verified with exact hamming.
    */
  def simHashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3,
      maxBucket: Int = 1000
  ): DataFrame = {
    val blocks = maxDistance + 1
    val bits = 64 / blocks
    val hashed = df.select(
      col(idCol).as("id"),
      simHash(split(trim(col(textCol)), "\\s+")).as("h"))
    val banded = hashed.select(
      col("id"), col("h"),
      explode(array((0 until blocks).map { b =>
        val mask = if (bits >= 64) -1L else (1L << bits) - 1L
        struct(lit(b).as("band"),
          shiftright(col("h"), b * bits).bitwiseAND(mask).as("bucket"))
      }: _*)).as("bk"))
    val pairs = banded
      .groupBy(col("bk.band"), col("bk.bucket"))
      .agg(collect_list(struct(col("id"), col("h").as("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(pairCombinations(col("members"))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.a.sh").as("h_a"),
        col("p.b.id").as("id_b"), col("p.b.sh").as("h_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("hamming", hamming64(col("h_a"), col("h_b")))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ---------------------------------------------------------------------
  // Embedding near-dup (cosine >= threshold)
  // ---------------------------------------------------------------------

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH buckets
    * (reuses Similarity.signBucket); candidates verified with exact
    * cosine. Same one-shuffle bucket-join shape as MinHash.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 12,
      tables: Int = 4,
      maxBucket: Int = 1000
  ): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      Similarity.normalize(col(vecCol)).as("v"))
    val banded = base.select(col("id"), col("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("band"),
          Similarity.signBucket(col("v"), planes, seed = t * 7919 + 17)
            .as("bucket"))): _*)).as("bk"))
    val pairs = banded
      .groupBy(col("bk.band"), col("bk.bucket"))
      .agg(collect_list(struct(col("id"), col("v").as("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(pairCombinations(col("members"))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.a.sh").as("v_a"),
        col("p.b.id").as("id_b"), col("p.b.sh").as("v_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
