package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  private lazy val newSnap = Seq(
    (1L, "a", 10.0),  // unchanged
    (2L, "b", 99.0),  // changed v
    (4L, "x", 40.0),  // changed s
    (5L, "e", 50.0)   // added; 3 removed
  ).toDF("k", "s", "v")

  test("classifies added, removed, and changed keys; omits unchanged") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("includeUnchanged reports every key") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "unchanged" && got.size == 5)
  }

  test("null payloads diff null-safely and positionally") {
    val a = Seq((1L, Option("x"), Option.empty[String]),
      (2L, Option.empty[String], Option.empty[String])).toDF("k", "c1", "c2")
    // key 1 swaps WHICH column is null — must be 'changed', not equal
    // (the xxhash64 null-marker case); key 2 stays all-null — unchanged
    val b = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option.empty[String], Option.empty[String])).toDF("k", "c1", "c2")
    val got = SnapshotDiff.diff(a, b, Seq("k"), includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("diffDetailed names the changed columns, sorted") {
    val got = SnapshotDiff.diffDetailed(oldSnap, newSnap, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[String](2))))
      .toMap
    assert(got(2L) == (("changed", Seq("v"))))
    assert(got(4L) == (("changed", Seq("s"))))
    assert(got(3L) == (("removed", Seq.empty)))
    assert(got(5L) == (("added", Seq.empty)))
    assert(!got.contains(1L))
  }

  test("diff is the exact inverse of mergeSnapshot's change application") {
    // apply a change set with Upsert, then diff must recover exactly
    // the applied keys
    val base = Seq((1L, 1.0, 1L, false), (2L, 2.0, 1L, false), (3L, 3.0, 1L, false))
      .toDF("k", "v", "ver", "del")
    val updates = Seq((2L, 9.0, 2L, false), (3L, 3.0, 2L, true), (4L, 4.0, 2L, false))
      .toDF("k", "v", "ver", "del")
    val merged = Upsert.mergeSnapshot(base, updates, Seq("k"), "ver",
      deleteCol = Some("del"))
    val got = SnapshotDiff.diff(
      base.filter(!col("del")).drop("del"), merged.drop("del"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2 changed (v and ver moved), 3 tombstoned -> removed, 4 inserted
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }
}
