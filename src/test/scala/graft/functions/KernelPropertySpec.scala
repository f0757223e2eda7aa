package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property-style tests (seeded randomness, deterministic) pinning the
  * algebraic laws the distributed plans rely on — not just point
  * goldens. Each law is the reason an operator's plan shape is sound:
  * the MinHash union law is why map-side signature partials compose;
  * SimHash order-invariance is why per-partition token order (which
  * Spark does not guarantee stable) cannot change verdicts.
  */
class KernelPropertySpec extends SparkTestBase {
  import spark.implicits._

  // fresh RNG per test (seed derived from the test name) so a failure
  // reproduces under `testOnly -- -z <name>` regardless of suite order
  private def rng(testName: String) = new scala.util.Random(testName.hashCode.toLong)

  private def randomTokenSet(rnd: scala.util.Random, maxLen: Int): Seq[String] =
    (0 until (1 + rnd.nextInt(maxLen))).map(_ => s"tok${rnd.nextInt(40)}").distinct

  test("jaccard kernel agrees with the set definition on random pairs") {
    val rnd = rng("jaccard-set-agreement")
    val cases = (1 to 300).map { _ =>
      (randomTokenSet(rnd, 30), randomTokenSet(rnd, 30))
    }
    val got = cases.toDF("a", "b")
      .select(VectorFunctions.jaccard(col("a"), col("b")).as("j"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), j) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if ((sa ++ sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j == expected, s"jaccard($a, $b): got $j expected $expected")
    }
  }

  test("minhash union law: sig(A ++ B) == elementwise min(sig(A), sig(B))") {
    // the algebraic property that makes signatures composable from
    // partial aggregates — and the basis of LSH banding
    val rnd = rng("minhash-union-law")
    val cases = (1 to 100).map { _ => (randomTokenSet(rnd, 20), randomTokenSet(rnd, 20)) }
    val rows = cases.toDF("a", "b")
      .select(
        VectorFunctions.minHashSignature(col("a"), 32).as("sa"),
        VectorFunctions.minHashSignature(col("b"), 32).as("sb"),
        VectorFunctions.minHashSignature(concat(col("a"), col("b")), 32).as("sab"))
      .collect()
    rows.foreach { r =>
      val (sa, sb, sab) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
      val expected = sa.zip(sb).map { case (x, y) => math.min(x, y) }
      assert(sab == expected)
    }
  }

  test("simhash is token-order invariant (vote sums commute)") {
    val rnd = rng("simhash-order-invariance")
    val cases = (1 to 100).map { _ =>
      val toks = (0 until (1 + rnd.nextInt(25))).map(_ => s"w${rnd.nextInt(30)}")
      (toks, rnd.shuffle(toks))
    }
    val rows = cases.toDF("a", "b")
      .select(VectorFunctions.simHash64(col("a")).as("ha"),
        VectorFunctions.simHash64(col("b")).as("hb"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shingles: every n-gram has n tokens; count == distinct windows") {
    val rnd = rng("shingle-windows")
    val texts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => s"t${rnd.nextInt(6)}").mkString(" ")
    }
    val rows = texts.toDF("t")
      .select(col("t"), VectorFunctions.shingles(col("t"), 3).as("sh"))
      .collect()
    rows.foreach { r =>
      val toks = r.getString(0).trim.split("\\s+").filter(_.nonEmpty)
      val sh = r.getSeq[String](1)
      val expected =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(sh == expected, s"text '${r.getString(0)}'")
      assert(sh.forall(_.split(" ").length == 3))
    }
  }

  test("cosine kernel is symmetric and 1.0 on self (non-zero vectors)") {
    val rnd = rng("cosine-symmetry")
    val vecs = (1 to 100).map { _ =>
      ((0 until 16).map(_ => rnd.nextDouble() + 0.1).toArray,
        (0 until 16).map(_ => rnd.nextDouble() + 0.1).toArray)
    }
    val rows = vecs.toDF("a", "b")
      .select(
        VectorFunctions.cosine(col("a"), col("b")).as("ab"),
        VectorFunctions.cosine(col("b"), col("a")).as("ba"),
        VectorFunctions.cosine(col("a"), col("a")).as("aa"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exact: same op order
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0 + 1e-12)
    }
  }

  test("hashBucket stays in range and near-uniform over random ids") {
    import graft.operators.Sampling
    val rnd = rng("hash-bucket-uniformity")
    val ids = (1 to 20000).map(_ => math.abs(rnd.nextLong()) / 2).toDF("id")
    val buckets = ids.select(Sampling.hashBucket(col("id")).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(buckets.forall { case (b, _) => b >= 0 && b < 1000 })
    // with 20k draws over 1000 buckets (mean 20), no bucket should be
    // wildly off under any acceptable hash (loose 4x bound)
    assert(buckets.forall(_._2 < 80), buckets.maxBy(_._2).toString)
  }
}
