package graft

import java.nio.file.Files

/** Drives the CLI entry end-to-end (config + fixture CSV -> sinks). */
class MainSpec extends SparkTestBase {

  test("CLI: full run writes sinks and archives; dry-run does not") {
    spark // ensure the shared session exists (Main's getOrCreate reuses it)
    val cfgPath = getClass.getResource("/mapping_config.xml").getPath
    val out = Files.createTempDirectory("main_out_")
    // work on a COPY — the configured archive step moves the input file
    val csv = out.resolve("production_data.csv")
    Files.copy(java.nio.file.Paths.get(
      getClass.getResource("/production_data_fixture.csv").getPath), csv)

    Main.main(Array(
      "--config", cfgPath, "--input", csv.toString,
      "--valid-out", s"$out/valid", "--errors-out", s"$out/errors",
      "--dry-run"))
    assert(!Files.exists(out.resolve("valid")))
    assert(Files.exists(csv)) // dry-run does not archive

    Main.main(Array(
      "--config", cfgPath, "--input", csv.toString,
      "--valid-out", s"$out/valid", "--errors-out", s"$out/errors"))
    val valid = SparkTestBase.spark.read.parquet(s"$out/valid")
    // full-rules mode (not parity): unique-daily demotes rows 0 and 5;
    // RI is skipped (no dim registered at the CLI) -> 4 valid
    assert(valid.count() == 4)
    assert(!Files.exists(csv)) // archived away
    assert(Files.list(out.resolve("processed")).count() == 1)
  }

  test("CLI rejects unknown arguments") {
    assertThrows[IllegalArgumentException](Main.main(Array("--bogus")))
  }
}
