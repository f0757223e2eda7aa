package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format training-data
  * pipelines actually pass around (one JSON object per line; Spark's
  * json format IS line-delimited by default, splittable per line, so a
  * 100 TB JSONL corpus parallelizes like any text source).
  *
  * Reads take an EXPLICIT schema: schema inference is a full extra
  * pass over the data (fine on a laptop, catastrophic at corpus
  * scale) and silently widens types on dirty data. Malformed lines
  * follow Spark's PERMISSIVE/DROPMALFORMED/FAILFAST modes; pass
  * `columnNameOfCorruptRecord` through `options` to capture bad lines
  * in-band.
  */
object Jsonl {

  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.read.options(options).schema(schema).json(path)

  /** `mode` defaults to Spark's errorifexists — pass "overwrite"
    * explicitly when replacing a target is intended; a silent default
    * overwrite would make every caller destructive.
    */
  def write(
      df: DataFrame, path: String,
      mode: String = "errorifexists",
      options: Map[String, String] = Map.empty
  ): Unit =
    df.write.options(options).mode(mode).json(path)
}
