package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Direct coverage of the kernel expressions: golden values, edge
  * cases, interpreted-vs-codegen agreement, and SQL registration.
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("dot and cosine golden values over float and double arrays") {
    val r = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0, 0.0, 1.0)))
      .toDF("f", "d")
      .select(
        VectorFunctions.dot(col("f"), col("d")).as("dot"),
        VectorFunctions.cosine(col("f"), col("f")).as("self"))
      .collect()(0)
    assert(r.getDouble(0) == 4.0) // 1*2 + 2*0 + 2*1, float->double exact
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("shingles kernel handles multi-space, exact-n, and unicode text") {
    val r = Seq("a  b\tc", "x y", "für die katze", "a a a a")
      .toDF("t")
      .select(VectorFunctions.shingles(col("t"), 2).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b", "b c")) // whitespace runs collapse
    assert(r(1) == Seq("x y"))        // exactly n tokens -> one shingle
    assert(r(2) == Seq("für die", "die katze"))
    assert(r(3) == Seq("a a"))        // duplicates collapse
  }

  test("shingles rejects non-positive n at construction") {
    assertThrows[IllegalArgumentException](
      VectorFunctions.shingles(col("t"), 0))
    assertThrows[IllegalArgumentException](
      VectorFunctions.shingles(col("t"), -1))
  }

  test("minhash signature: containment ordering of similar sets") {
    val rows = Seq("a b c d e f g h", "a b c d e f g h", "q w e r t y u i")
      .toDF("t")
      .select(VectorFunctions.minHashSignature(
        VectorFunctions.shingles(col("t"), 2), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
    assert(rows(0).length == 16)
  }

  test("minhash bands: identical docs collide in every band") {
    val rows = Seq("a b c d e f", "a b c d e f")
      .toDF("t")
      .select(VectorFunctions.minHashBands(
        VectorFunctions.shingles(col("t"), 2), 16, 4).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    assert(rows(0).length == 4)
  }

  test("tokenSetCount counts duplicates; multiTokenSetCount matches per-set counts") {
    val df = Seq("the cat and the dog").toDF("t")
      .select(split(col("t"), " ").as("toks"))
    val single = df.select(
      VectorFunctions.tokenSetCount(col("toks"), Seq("the", "and")).as("n"))
      .collect()(0).getLong(0)
    assert(single == 3) // the, and, the
    val multi = df.select(VectorFunctions.multiTokenSetCount(col("toks"),
      Seq(Seq("the", "and"), Seq("cat", "dog"), Seq("zebra"))).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(multi == Seq(3L, 2L, 0L))
  }

  test("interpreted eval agrees with codegen for every kernel") {
    // force the interpreted path by evaluating expressions directly
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = ArrayData.toArrayData(
      Array("a b c", "b c d").map(UTF8String.fromString): Array[Any])
    val fromEval = MinHashSignatureExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        toks, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 8)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray().toSeq
    val fromDf = Seq("a b c d").toDF("t")
      .select(VectorFunctions.minHashSignature(
        VectorFunctions.shingles(col("t"), 3), 8).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(fromEval == fromDf)

    // fingerprint + tokenCharSum: interpreted Literal eval vs codegen'd DF
    val words = ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(UTF8String.fromString): Array[Any])
    val lit3 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      words, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val fpEval = Fingerprint64Expr(lit3).eval(InternalRow.empty)
    val sumEval = TokenCharSumExpr(lit3).eval(InternalRow.empty)
    val row = Seq("alpha beta gamma").toDF("t")
      .select(
        VectorFunctions.fingerprint64(split(col("t"), "\\s+")).as("fp"),
        VectorFunctions.tokenCharSum(split(col("t"), "\\s+")).as("cs"))
      .collect()(0)
    assert(fpEval == row.getLong(0))
    assert(sumEval == row.getLong(1) && row.getLong(1) == 14L)
  }

  test("fingerprint kernel is bit-identical to the HOF formulation it replaced") {
    val texts = Seq("the quick brown fox", "a", "", "  spaced   out  ").toDF("t")
    val rows = texts.select(
      graft.operators.TextAnalysis.fingerprint(col("t")).as("kernel"),
      aggregate(split(trim(col("t")), "\\s+"), lit(1125899906842597L),
        (acc, tok) => acc * 31 + xxhash64(tok)).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SQL registration: kernels callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       graft_simhash(array('a','b')) = graft_simhash(array('a','b')) AS same,
        |       graft_shingles('a b c', 2) AS sh,
        |       graft_token_set_count(array('x','y','x'), array('x')) AS n,
        |       graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        |       graft_fingerprint(array('a','b')) = graft_fingerprint(array('a','b')) AS fp_same,
        |       graft_fingerprint(array('a','b')) = graft_fingerprint(array('b','a')) AS fp_ordered,
        |       graft_token_char_sum(array('ab','cde')) AS cs
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getBoolean(1))
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.5) // |{b,c}| / |{a,b,c,d}|
    assert(r.getBoolean(5))
    assert(!r.getBoolean(6)) // order-sensitive
    assert(r.getLong(7) == 5L)
    val r2 = spark.sql(
      """SELECT graft_char_ngrams('ABCD', 3) AS tg,
        |       graft_normalize_text('  a   b ') AS norm,
        |       graft_chunk_tokens('a b c d e', 3, 2) AS ch
        |""".stripMargin).collect()(0)
    assert(r2.getSeq[String](0) == Seq("abc", "bcd"))
    assert(r2.getString(1) == "a b")
    assert(r2.getSeq[String](2) == Seq("a b c", "c d e"))
  }

  test("signBucket: similar vectors share more buckets than dissimilar ones") {
    val df = Seq(
      (Seq(1.0, 0.2, 0.1, 0.4), Seq(1.0, 0.21, 0.1, 0.4), Seq(-1.0, 5.0, -2.0, 0.3))
    ).toDF("a", "b", "c")
    val r = (0 until 16).map { t =>
      val row = df.select(
        VectorFunctions.signBucket(col("a"), 8, t * 7919L + 17).as("ba"),
        VectorFunctions.signBucket(col("b"), 8, t * 7919L + 17).as("bb"),
        VectorFunctions.signBucket(col("c"), 8, t * 7919L + 17).as("bc"))
        .collect()(0)
      (row.getLong(0) == row.getLong(1), row.getLong(0) == row.getLong(2))
    }
    val nearMatches = r.count(_._1)
    val farMatches = r.count(_._2)
    assert(nearMatches > farMatches)
    assert(nearMatches >= 12) // near-identical vectors collide in most tables
  }
}
