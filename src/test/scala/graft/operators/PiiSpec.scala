package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact alice.smith+spam@sub.example.co.uk or bob@corp.io today"),
    (2L, "server at 192.168.1.1 and backup at 10.0.0.255 respond"),
    (3L, "call +1 (555) 123-4567 or 555 867 5309 now"),
    (4L, "clean document with no personal information at all"),
    (5L, "mixed: eve@ex.org from 172.16.0.9 dialed 020 7946 0958")
  ).toDF("doc_id", "text")

  test("piiStats counts each class") {
    val stats = Pii.piiStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) == (2L, 0L, 0L))
    assert(stats(2L) == (0L, 2L, 0L))
    assert(stats(3L) == (0L, 0L, 2L))
    assert(stats(4L) == (0L, 0L, 0L))
    assert(stats(5L) == (1L, 1L, 1L))
  }

  test("redact replaces every class with typed placeholders, leaves clean text alone") {
    val redacted = docs.select(col("doc_id"), Pii.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L) == "contact <EMAIL> or <EMAIL> today")
    assert(redacted(2L) == "server at <IP> and backup at <IP> respond")
    assert(redacted(3L) == "call <PHONE> or <PHONE> now")
    assert(redacted(4L) == "clean document with no personal information at all")
    assert(redacted(5L) == "mixed: <EMAIL> from <IP> dialed <PHONE>")
    assert(!redacted.values.exists(t =>
      t.contains("@") || t.matches(".*[0-9]{3}.*")))
  }

  test("IPv4s are not claimed by the phone pattern (no dot in its class)") {
    val r = Seq("10.0.0.1").toDF("t")
      .select(Pii.countPhones(col("t")).as("p"), Pii.countIpv4(col("t")).as("i"))
      .collect()(0)
    assert(r.getInt(0) == 0 && r.getInt(1) == 1)
  }

  test("pii scan is a pure projection (no shuffle, no UDF)") {
    val plan = Pii.piiStats(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython"), plan)
  }
}
