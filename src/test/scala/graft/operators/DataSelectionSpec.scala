package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DataSelectionSpec extends SparkTestBase {
  import spark.implicits._

  // target = docs 1,2 (English-like); raw = all 4.
  // Corpus tokens: doc1 "the cat sat", doc2 "the dog", doc3 "le chat",
  // doc4 "" -> vocab {the:2, cat:1, sat:1, dog:1, le:1, chat:1}, V=6,
  // t_raw=7, t_tgt=5.
  private val docs = Seq(
    (1L, "the cat sat", true),
    (2L, "the dog", true),
    (3L, "le chat", false),
    (4L, "", false)
  ).toDF("doc_id", "text", "tgt")

  private def ratio(cTgt: Long, cRaw: Long): Double =
    ((cTgt + 1).toDouble / (5 + 6).toDouble) / ((cRaw + 1).toDouble / (7 + 6).toDouble)

  test("importanceWeights: rational weights match the hand formula; empty doc zeroed") {
    val got = DataSelection.importanceWeights(docs, "doc_id", "text",
        isTarget = col("tgt"), logRatio = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "every input doc appears")
    // token-ascending fold per doc (IEEE addition order fixed)
    val w1 = (1.0 * ratio(1, 1) + 1.0 * ratio(1, 1)) + 1.0 * ratio(2, 2) // cat,sat,the
    val w2 = 1.0 * ratio(1, 1) + 1.0 * ratio(2, 2)                       // dog,the
    val w3 = 1.0 * ratio(0, 1) + 1.0 * ratio(0, 1)                       // chat,le
    assert(got(1L) == ((3L, w1)))
    assert(got(2L) == ((2L, w2)))
    assert(got(3L) == ((2L, w3)))
    assert(got(4L) == ((0L, 0.0)), "empty doc: zero tokens, zero weight")
    // target-typical tokens weigh above raw-typical: every target doc
    // outranks the out-of-target doc, and ratios straddle 1
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(3L)._2)
    assert(ratio(1, 1) > 1.0 && ratio(0, 1) < 1.0)
  }

  test("importanceWeights: log variant is the paper's LLR sign structure") {
    val got = DataSelection.importanceWeights(docs, "doc_id", "text",
        isTarget = col("tgt"), logRatio = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val w3 = math.log(ratio(0, 1)) + math.log(ratio(0, 1))
    assert(math.abs(got(3L) - w3) < 1e-12)
    assert(got(1L) > 0.0 && got(2L) > 0.0, "target docs: positive log-likelihood ratio")
    assert(got(3L) < 0.0, "non-target doc: negative LLR")
    assert(got(4L) == 0.0)
  }

  test("importanceWeights: plan broadcasts the ratio table, no shuffle of the corpus beyond token aggs") {
    val plan = DataSelection.importanceWeights(docs, "doc_id", "text",
        isTarget = col("tgt"), logRatio = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast ratio join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }
}
