package graft.rules

import graft.SparkTestBase
import graft.config.{FieldMapping, ValidationRule}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-rule semantics of the compiler, matching the reference's
  * interpreter (src/data_validator.py:137-202) edge for edge.
  */
class RuleCompilerSpec extends SparkTestBase {
  import spark.implicits._

  /** Compile one field's rules over a single string column "v" and
    * return (input -> error types in order).
    */
  private def errorsFor(m: FieldMapping, inputs: Seq[String]): Map[String, Seq[String]] = {
    val df = inputs.toDF("v")
      .withColumn("errs", RuleCompiler.compileField(
        m, RuleCompiler.defaultLookups, _ => true, col("v")))
      .select(col("v"), col("errs.ErrorType").as("types"))
    df.collect().map(r => Option(r.getString(0)).getOrElse("<null>")
      -> r.getSeq[String](1)).toMap
  }

  test("not_null: null and whitespace-only fail; zero does not") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false,
      Seq(ValidationRule("not_null", Map.empty)))
    val res = errorsFor(m, Seq("ok", "  ", "0"))
    assert(res("ok").isEmpty)
    assert(res("  ") == Seq("NOT_NULL"))
    assert(res("0").isEmpty)
  }

  test("range: bounds inclusive; non-numeric is a distinct NUMERIC error") {
    val m = FieldMapping("v", "V", "decimal(5,2)", required = false,
      Seq(ValidationRule("range", Map("min" -> "-10.0", "max" -> "200.0"))))
    val res = errorsFor(m, Seq("145.5", "-10.0", "200.0", "-10.01", "300.0", "abc", "1e2"))
    assert(res("145.5").isEmpty)
    assert(res("-10.0").isEmpty)   // inclusive lower
    assert(res("200.0").isEmpty)   // inclusive upper
    assert(res("-10.01") == Seq("RANGE"))
    assert(res("300.0") == Seq("RANGE"))
    assert(res("abc") == Seq("NUMERIC"))
    assert(res("1e2").isEmpty)     // scientific notation parses (float('1e2'))
  }

  test("regex: anchored at start like re.match, not unanchored search") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false,
      Seq(ValidationRule("regex", Map("pattern" -> "^LINE[0-9]{3}$"))))
    val res = errorsFor(m, Seq("LINE001", "xLINE001", "LINE001x", "bad-line"))
    assert(res("LINE001").isEmpty)
    assert(res("xLINE001") == Seq("REGEX"))
    assert(res("LINE001x") == Seq("REGEX"))
    assert(res("bad-line") == Seq("REGEX"))
  }

  test("regex without explicit anchors still matches from the start only") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false,
      Seq(ValidationRule("regex", Map("pattern" -> "OP[0-9]+"))))
    val res = errorsFor(m, Seq("OP1", "xxOP1"))
    assert(res("OP1").isEmpty)     // re.match succeeds
    assert(res("xxOP1") == Seq("REGEX")) // re.match fails (search would pass)
  }

  test("date_range: bounds; unparsable date is a distinct DATE_FORMAT error") {
    val m = FieldMapping("v", "V", "datetime", required = false,
      Seq(ValidationRule("date_range", Map("min" -> "2020-01-01", "max" -> "2099-12-31"))))
    val res = errorsFor(m, Seq(
      "2024-02-15 08:30:00", "2019-12-31 23:59:59", "2100-01-01 00:00:00", "not-a-date"))
    assert(res("2024-02-15 08:30:00").isEmpty)
    assert(res("2019-12-31 23:59:59") == Seq("DATE_RANGE"))
    assert(res("2100-01-01 00:00:00") == Seq("DATE_RANGE"))
    assert(res("not-a-date") == Seq("DATE_FORMAT"))
  }

  test("lookup: demo product set membership (reference hardcoded set)") {
    val m = FieldMapping("v", "V", "varchar(15)", required = false,
      Seq(ValidationRule("lookup",
        Map("table" -> "Production.Products", "column" -> "ProductCode"))))
    val res = errorsFor(m, Seq("PROD-A1", "PROD-D4", "INVALID-CODE"))
    assert(res("PROD-A1").isEmpty)
    assert(res("PROD-D4").isEmpty)
    assert(res("INVALID-CODE") == Seq("LOOKUP"))
  }

  test("required+null short-circuits to a single REQUIRED_FIELD_MISSING") {
    val m = FieldMapping("v", "V", "datetime", required = true, Seq(
      ValidationRule("not_null", Map.empty),
      ValidationRule("date_range", Map("min" -> "2020-01-01", "max" -> "2099-12-31"))))
    val res = errorsFor(m, Seq(null, "2024-02-15 08:30:00"))
    assert(res("<null>") == Seq("REQUIRED_FIELD_MISSING"))
    assert(res("2024-02-15 08:30:00").isEmpty)
  }

  test("optional+null runs no rules at all") {
    val m = FieldMapping("v", "V", "decimal(5,2)", required = false,
      Seq(ValidationRule("range", Map("min" -> "0.0", "max" -> "100.0"))))
    val res = errorsFor(m, Seq(null.asInstanceOf[String], "55.5", "101.0"))
    assert(res("<null>").isEmpty)
    assert(res("55.5").isEmpty)
    assert(res("101.0") == Seq("RANGE"))
  }

  test("multi-rule field emits errors in rule-declaration order") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false, Seq(
      ValidationRule("not_null", Map.empty),
      ValidationRule("regex", Map("pattern" -> "^A$")),
      ValidationRule("range", Map("min" -> "0", "max" -> "9"))))
    val res = errorsFor(m, Seq("zzz"))
    // not whitespace -> no NOT_NULL; fails regex; fails numeric cast
    assert(res("zzz") == Seq("REGEX", "NUMERIC"))
  }

  test("error struct carries field name, message, and raw value") {
    val m = FieldMapping("temperature_c", "T", "decimal(5,2)", required = false,
      Seq(ValidationRule("range", Map("min" -> "-10.0", "max" -> "200.0"))))
    val row: Row = Seq("300.0").toDF("temperature_c")
      .withColumn("errs", RuleCompiler.compileField(
        m, RuleCompiler.defaultLookups, _ => true, col("temperature_c")))
      .select(explode(col("errs")).as("e")).select("e.*").collect()(0)
    assert(row.getAs[String]("FieldName") == "temperature_c")
    assert(row.getAs[String]("ErrorType") == "RANGE")
    assert(row.getAs[String]("ErrorMessage").contains("exceeds maximum"))
    assert(row.getAs[String]("FieldValue") == "300.0")
  }

  test("numeric cast overlap with Python float(): spaces, scientific, infinity") {
    // SURVEY §7.3: pin the float()-vs-cast(double) overlap
    val m = FieldMapping("v", "V", "decimal(5,2)", required = false,
      Seq(ValidationRule("range", Map("min" -> "0", "max" -> "1000"))))
    val res = errorsFor(m, Seq("  5 ", "1e2", "Infinity", "0x10", "1_000"))
    assert(res("  5 ").isEmpty)          // both trim whitespace
    assert(res("1e2").isEmpty)           // both accept scientific notation
    assert(res("Infinity") == Seq("RANGE")) // parses as +inf -> above max (like float('inf'))
    assert(res("0x10") == Seq("NUMERIC"))   // neither accepts hex
    assert(res("1_000") == Seq("NUMERIC"))  // Python underscores NOT accepted by cast; flagged
  }

  test("range with only one bound enforces just that bound") {
    val minOnly = FieldMapping("v", "V", "int", required = false,
      Seq(ValidationRule("range", Map("min" -> "0"))))
    val r1 = errorsFor(minOnly, Seq("-1", "999999"))
    assert(r1("-1") == Seq("RANGE"))
    assert(r1("999999").isEmpty)
    val maxOnly = FieldMapping("v", "V", "int", required = false,
      Seq(ValidationRule("range", Map("max" -> "10"))))
    val r2 = errorsFor(maxOnly, Seq("-999", "11"))
    assert(r2("-999").isEmpty)
    assert(r2("11") == Seq("RANGE"))
  }

  test("rules with missing required params compile to no-ops, not crashes") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false, Seq(
      ValidationRule("regex", Map.empty),           // no pattern
      ValidationRule("lookup", Map.empty),          // no table/column
      ValidationRule("range", Map.empty)))          // no bounds
    val res = errorsFor(m, Seq("anything", "123"))
    assert(res("anything") == Seq("NUMERIC")) // boundless range still type-checks
    assert(res("123").isEmpty)
  }

  test("unknown rule types are skipped like the reference's dispatch") {
    val m = FieldMapping("v", "V", "varchar(10)", required = false, Seq(
      ValidationRule("chromatic_aberration", Map.empty),
      ValidationRule("not_null", Map.empty)))
    val res = errorsFor(m, Seq("ok", " "))
    assert(res("ok").isEmpty)
    assert(res(" ") == Seq("NOT_NULL"))
  }
}
