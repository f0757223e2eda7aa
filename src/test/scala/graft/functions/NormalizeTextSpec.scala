package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t")
      .select(VectorFunctions.normalizeText(col("t")))
      .collect()(0).getString(0)

  test("NFC composes decomposed accents") {
    // "cafe" + combining acute (U+0301) composes to U+00E9
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("caf\u00e9") == "caf\u00e9") // already composed: unchanged
  }

  test("control characters become spaces and runs collapse") {
    assert(norm("a\u0007b") == "a b") // BEL
    assert(norm("a\t\t b\r\nc") == "a b c")
    assert(norm("a\u0000\u001f\u007f\u009fb") == "a b") // C0/DEL/C1 run
  }

  test("trims and collapses but preserves unicode spaces") {
    assert(norm("  hello   world  ") == "hello world")
    // NBSP is a tokenizer decision, not hygiene \u2014 preserved
    assert(norm("a\u00a0b") == "a\u00a0b")
  }

  test("empty, whitespace-only, and null inputs") {
    assert(norm("") == "")
    assert(norm(" \t\r\n ") == "")
    val r = Seq(Option.empty[String]).toDF("t")
      .select(VectorFunctions.normalizeText(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("idempotent: normalizing twice is a no-op") {
    val messy = "  cafe\u0301  x\t\ty \u0007 z  "
    assert(norm(norm(messy)) == norm(messy))
  }
}
