package graft.functions

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent oracle: replay the merge table in RANK ORDER, one full
    * left-to-right pass per merge — a different algorithm shape from the
    * runtime's greedy lowest-rank-adjacent loop, but provably the same
    * segmentation. Any divergence flags a kernel bug.
    */
  private def replayCountWord(word: String): Int = {
    var syms = word.map(String.valueOf(_)).toList
    Bpe.default.merges.takeWhile(_ => syms.length > 1).foreach { case (a, b) =>
      val out = scala.collection.mutable.ListBuffer[String]()
      var rest = syms
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
      syms = out.toList
    }
    syms.length
  }
  private def replayCount(text: String): Long = {
    val m = Bpe.pretoken.matcher(text)
    var n = 0L
    while (m.find()) {
      val w = text.substring(m.start, m.end)
      n += (if (w.length == 1) 1 else replayCountWord(w))
    }
    n
  }

  test("vendored merge table loads and is non-trivial") {
    assert(Bpe.default.merges.length > 1000)
    // every merge symbol is word-internal ([A-Za-z0-9_]+) — the
    // invariant that makes the tab-separated resource format safe
    assert(Bpe.default.merges.forall { case (a, b) =>
      (a + b).forall(c => c.isLetterOrDigit || c == '_') })
  }

  test("goldens: corpus words collapse, English splits to subwords, unknown stays chars") {
    val cases = Seq(
      "the quick brown fox jumps" -> 13L,
      "key agg row scan slow fast table" -> 7L, // all in-corpus -> 1 token/word
      "manufacturing quality control systems" -> 7L,
      "catalyst optimizer internals" -> 8L,
      "a" -> 1L,
      "" -> 0L,
      "  " -> 0L,
      "hello, world! 123" -> 9L,
      "zqxj vvkk" -> 8L) // no applicable merges -> one token per char
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("kernel agrees with the rank-sequential replay oracle on the sf0.01 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect()
    assert(docs.length == 500)
    docs.foreach { r =>
      val text = r.getString(1)
      assert(r.getLong(2) == replayCount(text), s"doc ${r.getLong(0)}: '$text'")
    }
    // and on text unlike the corpus (real English with subword splits)
    val prose = "Deterministic subword segmentation underpins reproducible " +
      "token budgets; unseen compounds like hyperparameter sweeps still tokenize."
    val n = Seq(prose).toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t"))).collect()(0).getLong(0)
    assert(n == replayCount(prose))
  }

  test("count bounds: pretokens <= bpe <= non-space chars; null -> 0") {
    val viol = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("lo"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("hi"))
      .filter(col("n") < col("lo") || col("n") > col("hi"))
      .count()
    assert(viol == 0)
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextAnalysis.bpeTokenCount(col("t"))).collect()(0)
    assert(r.getLong(0) == 0L)
  }

  test("interpreted eval matches codegen'd DataFrame path") {
    val s = "manufacturing the quick zqxj"
    val fromEval = BpeCountExpr(
      Literal.create(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(InternalRow.empty)
    val fromDf = Seq(s).toDF("t")
      .select(BpeFunctions.bpeTokenCount(col("t"))).collect()(0).getLong(0)
    assert(fromEval == fromDf)
  }

  test("SQL registration: graft_bpe_count callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_bpe_count('key agg row') AS a, graft_bpe_count('') AS b")
      .collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 0L)
  }

  test("BPE counts drive the token-budget sampler (the composition the vocab exists for)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        col("text"))
    val budget = 4000L
    val kept = graft.operators.Sampling
      .sampleToTokenBudget(docs, "doc_id", "n_bpe", budget, "lang")
      .collect()
    assert(kept.nonEmpty && kept.length < 500)
    // counts flowing through the sampler are real BPE counts
    kept.foreach(r => assert(r.getLong(2) == replayCount(r.getString(3))))
    // budget respected per lang: everything before the last-kept doc fits
    // strictly under budget, i.e. sum(kept) < budget + max single doc
    kept.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val toks = rows.map(_.getLong(2))
      assert(toks.sum < budget + toks.max, s"lang $lang over budget")
    }
  }

  test("parse rejects malformed merge lines; comments and blanks skipped") {
    intercept[IllegalArgumentException] {
      Bpe.parse(Iterator("a\tb", "nodelimiter"))
    }
    intercept[IllegalArgumentException](Bpe.parse(Iterator("# only a comment", "")))
    val v = Bpe.parse(Iterator("# c", "", "a\tb"))
    assert(v.merges.toSeq == Seq(("a", "b")))
    assert(v.countWord("ab") == 1 && v.countWord("ba") == 2)
  }
}
