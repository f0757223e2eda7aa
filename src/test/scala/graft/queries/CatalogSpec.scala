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
}
