package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the storage-side answer to the shuffle.
  *
  * A join between two tables bucketed by the SAME columns into the SAME
  * bucket count needs no Exchange on either side — each task reads the
  * matching bucket files and merges them locally. At 100 TB this turns
  * the recurring cost of a fact-to-fact join (two full-table shuffles
  * per query) into a one-time cost paid at write, which is the right
  * trade for tables joined more often than they are rewritten (the
  * lineitem⋈orders shape, or a document table joined to its per-doc
  * feature/embedding tables by doc_id).
  *
  * Bucketing also prunes: an equality filter on the bucket column reads
  * only the one bucket's files. `sortBy` additionally pre-sorts each
  * bucket file so a sort-merge join skips its sort when each bucket
  * holds a single file (write with one task per bucket, or compact).
  *
  * Spark-native mechanics (no custom reader needed): `bucketBy` tables
  * carry their layout in the catalog; the planner drops the Exchange
  * when `spark.sql.sources.bucketing.enabled` (default true) and bucket
  * counts match. BucketingSpec asserts the physical plan of the joined
  * read has zero shuffle exchanges on the join.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally per-bucket-sorted) external
    * parquet table at `path`, registered as `tableName` in the session
    * catalog. Overwrites both data and catalog entry, so repeated runs
    * are idempotent.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil
  ): Unit = {
    val spark = df.sparkSession
    // overwrite of an external table keeps stale catalog state around
    // in some layouts — drop first so (path, layout) always match
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val base = df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) base.sortBy(sortCols.head, sortCols.tail: _*)
      else base
    sorted.saveAsTable(tableName)
  }

  /** Equi-join two identically-bucketed catalog tables on `keys`,
    * pinned to a sort-merge join (the `merge` hint) so the plan
    * demonstrates the bucketed case: zero Exchanges feeding the join.
    * A broadcast join would also skip the big side's shuffle, but only
    * while one side stays small — the bucketed SMJ is the shape that
    * survives both sides growing 1000×.
    */
  def bucketedEquiJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[(String, String)]
  ): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    val cond = keys
      .map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _)
    l.join(r, cond)
  }
}
