package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog lives in [[graft.queries.Queries]]; this object is the
  * stable harness surface.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the compiled validation-rule set + split summary over lineitem
    * (the engine's signature dataflow) and returns the error fan-out.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p9_error_fanout")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash/LSH — covered by ScalaTest goldens). */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracleSql
}
