package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object RepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(sys.env.getOrElse("PROBE_QUERY", "x_stream_dedup"))
    val n = sys.env.getOrElse("PROBE_REPS", "9").toInt
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def stats(): String = {
      val p = pools.map(b => f"${b.getName.replace(' ','_')}=${b.getUsage.getUsed/1048576}%dM").mkString(" ")
      val g = gcs.map(b => s"${b.getName.replace(' ','_')}:${b.getCollectionCount}/${b.getCollectionTime}ms").mkString(" ")
      p + " | " + g + " | threads=" + Thread.activeCount()
    }
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  ${stats()}")
    }
    spark.stop()
  }
}
