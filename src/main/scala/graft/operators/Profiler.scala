package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-quality survey a validation engine runs
  * before rules are even written (what fraction of each field is null?
  * how many distinct codes? what range do the numerics span?).
  *
  * One pass over the data: every per-column metric is computed in a
  * single `agg`, then reshaped to long format (one row per column)
  * with a literal-array explode — no per-column scans, no shuffle
  * beyond the aggregation itself.
  *
  * `exact = false` swaps COUNT(DISTINCT) for HyperLogLog
  * `approx_count_distinct` — at 100 TB exact distinct counts on
  * high-cardinality columns force a huge expand+shuffle; the sketch is
  * one pass and mergeable. Exact mode exists for oracle comparison and
  * small dims.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isNumeric(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    // positional aliases: immune to dots/backticks/specials in names;
    // ONE shared total-row count, not one per column
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
      val distinctAgg =
        if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$i"),
        distinctAgg.as(s"__distinct_$i"),
        (if (isNumeric(c)) min(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"__min_$i"),
        (if (isNumeric(c)) max(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"__max_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("column_name"),
      col("__rows").as("n_rows"),
      col(s"__nulls_$i").as("n_nulls"),
      col(s"__distinct_$i").as("n_distinct"),
      col(s"__min_$i").as("min_value"),
      col(s"__max_$i").as("max_value")) }: _*)
    wide.select(explode(rows).as("p")).select("p.*")
  }

  /** Numeric quantile profile via `approx_percentile` (t-digest-style
    * mergeable sketch — one pass, no sort, no full shuffle; the only
    * way to quantile 100 TB). Output: one row per (column, percentile).
    */
  def profileQuantiles(
      df: DataFrame,
      cols: Seq[String],
      percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      accuracy: Int = 10000
  ): DataFrame = {
    require(cols.nonEmpty, "profileQuantiles needs at least one column")
    require(percentiles.nonEmpty, "need at least one percentile")
    val pArr = array(percentiles.map(lit): _*)
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      approx_percentile(col(c).cast(DoubleType), pArr, lit(accuracy)).as(s"__q_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.zipWithIndex.flatMap { case (c, i) =>
      percentiles.zipWithIndex.map { case (p, j) =>
        struct(
          lit(c).as("column_name"),
          lit(p).as("percentile"),
          col(s"__q_$i").getItem(j).as("value"))
      }
    }: _*)
    wide.select(explode(rows).as("p")).select("p.*")
  }

  /** Per-source corpus data card — the summary table a dataset release
    * publishes (and a mixing decision starts from): document and
    * distinct-language counts, total whitespace tokens and characters,
    * and the exact-duplicate footprint (`n_distinct_texts`, counted on
    * a 128-bit content hash so the distinct state carries 16-byte
    * digests, not document bodies). All columns are integers —
    * hash-exact.
    *
    * Plan shape: ONE map-side-combined aggregate over the corpus; the
    * two distinct counts are expand-based distinct aggs whose
    * per-group state is bounded by |langs| and |distinct texts within
    * the source| hash digests. At 100 TB swap `countDistinct` for
    * `approx_count_distinct` if per-source distinct-text cardinality
    * itself is the memory risk — the exact form is the oracle-checked
    * contract here.
    */
  def corpusCard(
      df: DataFrame, sourceCol: String, langCol: String,
      textCol: String, charsCol: String
  ): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col(langCol)).as("n_langs"),
        countDistinct(md5(col(textCol))).as("n_distinct_texts"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast(LongType)).as("total_tokens"),
        sum(col(charsCol).cast(LongType)).as("total_chars"))
}
