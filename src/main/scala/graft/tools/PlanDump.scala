package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a catalog entry's EXECUTED physical plan (post-AQE, with
  * reuse/exchange nodes resolved) after running it once — the audit
  * surface for "does this union reuse its join?", "did the filter push
  * down?", "is there a cartesian?" questions the per-entry scale
  * arguments rest on.
  *
  *   sbt "runMain graft.tools.PlanDump x_open_orders /root/testdata/sf0.001"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <entryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(s"=== $name @ $sfDir (executed, post-AQE) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
