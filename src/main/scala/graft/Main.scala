package graft

import graft.config.XmlConfigParser
import graft.pipeline.ValidationPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry mirroring the reference's `main.py` surface
  * (reference src/main.py:58-93): single-file or glob-batch dispatch,
  * `--config` path, `--dry-run` (which here actually works — the
  * reference parses it and drops it, src/main.py:77-90).
  *
  * Usage:
  *   graft.Main --config cfg.xml [--input file.csv | --batch 'glob'] \
  *     [--valid-out dir] [--errors-out dir] [--dry-run]
  *
  * Without --input, the glob from the config's <FilePath> runs as ONE
  * multi-file scan (the reference loops file-by-file; Spark's glob scan
  * is the same semantics, parallel, with per-file lineage kept in the
  * FileSource column). `--batch` instead runs the reference's per-file
  * loop (main.py:34-55): one pipeline run per matched file, failures
  * isolated and reported as `success/total` — use it when a corrupt
  * vendor file must not abort the rest of the batch.
  */
object Main {
  def main(args: Array[String]): Unit = {
    var configPath = "config/mapping_config.xml"
    var input: Option[String] = None
    var batch: Option[String] = None
    var validOut = "out/valid"
    var errorsOut = "out/errors"
    var dryRun = false
    var i = 0
    def valueOf(flag: String): String = {
      if (i + 1 >= args.length)
        throw new IllegalArgumentException(s"$flag requires a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--config"     => configPath = valueOf("--config"); i += 2
        case "--input"      => input = Some(valueOf("--input")); i += 2
        case "--batch"      => batch = Some(valueOf("--batch")); i += 2
        case "--valid-out"  => validOut = valueOf("--valid-out"); i += 2
        case "--errors-out" => errorsOut = valueOf("--errors-out"); i += 2
        case "--dry-run"    => dryRun = true; i += 1
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    if (input.isDefined && batch.isDefined)
      throw new IllegalArgumentException(
        "--input and --batch are mutually exclusive; pass one")
    val cfg = XmlConfigParser.parseFile(configPath)
    val inputPath = input.getOrElse(cfg.source.filePath)

    // only stop a session this entry point itself created (embedding
    // callers — tests, notebooks — keep theirs)
    val hadSession = SparkSession.getDefaultSession.exists(!_.sparkContext.isStopped)
    // spark-submit injects spark.master; standalone invocations (sbt run,
    // plain java) fall back to all local cores
    val master = sys.props.getOrElse("spark.master",
      sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    val spark = SparkSession.builder()
      .appName("graft-etl")
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    try {
      val pipeline = new ValidationPipeline(cfg, parityMode = false)
      batch match {
        case Some(pattern) =>
          val result = pipeline.runBatch(spark, pattern, validOut, errorsOut, dryRun)
          if (result.total == 0) println(s"No files found matching: $pattern")
          result.files.foreach { f =>
            f.summary match {
              case Some(s) =>
                println(s"${f.file}: total=${s.total} valid=${s.valid} " +
                  s"invalid=${s.invalid} errors=${s.errorCount}")
                // archive each successfully processed local file when
                // configured (reference archives per file post-load)
                if (!dryRun) {
                  // runBatch reports qualified Hadoop paths (file:/...);
                  // Hadoop's Path handles spaces/# that java.net.URI rejects
                  val hadoopUri = new org.apache.hadoop.fs.Path(f.file).toUri
                  // archive is a LOCAL-filesystem move; a remote scheme
                  // (hdfs://host/x) must not archive a coincidentally
                  // existing local /x
                  if (hadoopUri.getScheme == null || hadoopUri.getScheme == "file") {
                    val p = Paths.get(hadoopUri.getPath)
                    if (Files.isRegularFile(p))
                      pipeline.archive(p, p.toAbsolutePath.getParent.resolve("processed"))
                  }
                }
              case None =>
                println(s"${f.file}: FAILED: ${f.error.getOrElse("")}")
            }
          }
          println(s"BATCH COMPLETE: ${result.successCount}/${result.total} " +
            "files processed successfully" + (if (dryRun) " (dry-run)" else ""))
        case None =>
          val summary = pipeline.run(spark, inputPath, validOut, errorsOut, dryRun)
          // archive single concrete input files when configured (glob inputs
          // stay in place, matching per-file semantics only for real files)
          if (!dryRun) input.map(Paths.get(_)).filter(Files.isRegularFile(_)).foreach { f =>
            pipeline.archive(f, f.toAbsolutePath.getParent.resolve("processed"))
          }
          println(s"total=${summary.total} valid=${summary.valid} " +
            s"invalid=${summary.invalid} errors=${summary.errorCount}" +
            (if (dryRun) " (dry-run)" else ""))
      }
    } finally if (!hadSession) spark.stop()
  }
}
