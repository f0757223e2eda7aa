package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Catalog-integrity invariants the driver harness assumes but nothing
  * previously enforced: a `queries` entry WITHOUT an `oracleSql` twin
  * silently downgrades to a rows-only check (the weakest gate), and a
  * stale oracle name would never run at all. Locking the key sets
  * turns both mistakes into a loud test failure at commit time instead
  * of a quiet correctness-coverage regression in the round artifact.
  */
class CatalogSpec extends SparkTestBase {

  test("every catalog entry ships an oracle, and every oracle has an entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"entries with NO oracle (would silently downgrade to rows-only): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphaned oracles (never run): ${(o -- q).toSeq.sorted}")
  }

  test("the flagship entry returns rows at the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("session-gap sweep at 30 minutes equals the sessionized frame's count") {
    // x_session_gap_sweep derives sessions(T) = users + gaps>T from one
    // lag pass; the closed form must agree with the explicit
    // sessionization both entries' users rely on
    val sweep30 = SparkEntry.queries("x_session_gap_sweep")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sessions = SparkEntry.queries("x_sessionize")(spark, sfDir).count()
    assert(sweep30(30L) == sessions,
      s"closed form ${sweep30(30L)} != sessionized $sessions")
  }
}
