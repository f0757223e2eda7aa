package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the file-layout janitor every long-running
  * ingest needs. Streaming sinks, per-batch writers, and fine-grained
  * partitioning all accrete files far below the efficient scan size;
  * at 100 TB the cost is real: driver-side listing latency, a scan
  * task per tiny file, and parquet footer overhead per file.
  *
  * `compact` sizes the output from the INPUT'S actual bytes (a
  * metadata-only listing — no data pass) and rewrites with `coalesce`,
  * which merges existing partitions without a shuffle: each output
  * task reads several input files and writes one. `rebalance = true`
  * swaps in a `repartition` round-robin shuffle for the pathological
  * case (a few huge files among many tiny ones) where coalesce's
  * merge-adjacent strategy would keep the imbalance.
  *
  * The rewrite goes to a NEW directory — atomic swap (write, verify,
  * rename) stays with the caller, which is what an orchestrated
  * pipeline wants anyway.
  */
object Compaction {

  final case class CompactionStats(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long)

  /** Data files under `dir` (recursive), skipping hidden/metadata
    * entries (`_SUCCESS`, checksums, checkpoints).
    */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath.toString, f.getLen))
    }
    out.result()
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` with file
    * count `ceil(totalBytes / targetFileBytes)` (at least 1). Returns
    * before/after stats so callers can decide whether to swap.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      rebalance: Boolean = false
  ): CompactionStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val before = dataFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val sized = if (rebalance) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").parquet(outDir)
    val after = dataFiles(spark, outDir)
    CompactionStats(before.size, totalBytes, after.size, after.map(_._2).sum)
  }
}
