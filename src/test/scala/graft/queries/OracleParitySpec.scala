package graft.queries

import graft.SparkTestBase
import graft.rules.RuleCompiler
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Pins the engine-vs-oracle FORMULATION equivalence the streaming
  * oracles depend on, on data the parquet testdata doesn't contain:
  * rows with nulls in the rule-checked lineitem columns. The oracles'
  * shared flags fragment (`Queries.lineitemFlagTermsSql`) is portable
  * arithmetic (CASE/comparison/trim/timestamp literals evaluate
  * identically in Spark and DuckDB), so running THAT SQL in Spark
  * against the compiled rule column proves the two sides cannot
  * diverge on null-bearing corpora — upgrading a latent review finding
  * to a pinned invariant. Error COUNTS are compared, not just
  * validity: x_stream_error_rate's error_count sums per-row error
  * counts, so the required-null short-circuit (exactly ONE error for a
  * null required field, no rule errors) must hold term by term.
  */
class OracleParitySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("l_quantity", DoubleType, nullable = true),
    StructField("l_discount", DoubleType, nullable = true),
    StructField("l_shipdate", TimestampType, nullable = true),
    StructField("l_returnflag", StringType, nullable = true)))

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("streaming-oracle flags SQL matches the compiled rules row by row, nulls included") {
    val rows = Seq(
      // fully valid
      Row(10.0, 0.02, ts("1997-01-01 00:00:00"), "A"),
      // one violation per field
      Row(99.0, 0.02, ts("1997-01-01 00:00:00"), "A"), // quantity above max
      Row(1.0, 0.02, ts("1997-01-01 00:00:00"), "A"),  // quantity below min
      Row(10.0, 0.5, ts("1997-01-01 00:00:00"), "A"),  // discount above max
      Row(10.0, 0.02, ts("1990-01-01 00:00:00"), "A"), // date below min
      Row(10.0, 0.02, ts("2024-01-01 00:00:00"), "A"), // date above max
      Row(10.0, 0.02, ts("1997-01-01 00:00:00"), "  "),// blank flag (not_null)
      // the latent-null cases the parquet testdata never exercises:
      // required+null must be exactly ONE error, not zero
      Row(null, 0.02, ts("1997-01-01 00:00:00"), "A"),
      Row(10.0, null, ts("1997-01-01 00:00:00"), "A"),
      Row(10.0, 0.02, null, "A"),
      Row(10.0, 0.02, ts("1997-01-01 00:00:00"), null),
      // several nulls + a rule violation: counts must add field-wise
      Row(null, null, null, null),
      Row(99.0, null, ts("1990-01-01 00:00:00"), " "))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val compared = df
      .withColumn("engine_n_err",
        size(RuleCompiler.compileRow(Queries.lineitemRules)).cast(LongType))
      .withColumn("oracle_n_err",
        expr(Queries.lineitemFlagTermsSql).cast(LongType))
    val diverging = compared
      .filter(col("engine_n_err") =!= col("oracle_n_err")).collect()
    assert(diverging.isEmpty,
      s"engine vs oracle n_err diverge on:\n${diverging.mkString("\n")}")

    // non-vacuity: the fixture exercises 0, 1, and multi-error rows
    val counts = compared.select(col("engine_n_err")).collect().map(_.getLong(0))
    assert(counts.contains(0L) && counts.contains(1L) && counts.exists(_ >= 3L))
  }
}
