package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given SF
  * (median of SPARK_GRAFT_BENCH_REPS runs each, default 3) and
  * prints one JSON line. Materializes each result with a noop-format
  * write so Catalyst cannot prune the computed columns the way a bare
  * `count()` would (a rule-compiler query's `errors` array must actually
  * be evaluated for the timing to mean anything). Session config matches
  * Verify (UTC, non-ANSI) so timings reflect the verified plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: exercise parquet scan + shuffle + codegen + noop
    // write once so the first timed query isn't charged JIT/classloading
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // per-query MEDIAN of 3 consecutive runs: single-shot timings moved
    // ±20% round-over-round with no code change (bimodal JIT compilation
    // of large generated methods — see BASELINE.md); the median drops
    // the odd cold/deopt run so round-over-round comparisons track code,
    // not noise. Stable iteration order keeps timings comparable.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // sentinel: a failed query must not read as a fast one
        }
      }
      // ANY failed rep keeps the failure sentinel: an intermittently
      // failing query must not report its lone success as a healthy time
      val sorted = times.sorted
      name -> (if (sorted.head < 0) -1.0 else sorted(sorted.size / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
