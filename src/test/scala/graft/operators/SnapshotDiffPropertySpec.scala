package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for SnapshotDiff: on randomly generated snapshot
  * pairs (random keys, random payloads incl. nulls, random mutations),
  * the classification always equals a brute-force per-key comparison.
  * Raw ScalaCheck generators with fixed seeds (the scalatestplus
  * bridge isn't on the offline classpath — same setup as
  * RulePropertySpec).
  */
class SnapshotDiffPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val payloadGen: Gen[(Option[String], Option[Long])] = Gen.zip(
    Gen.oneOf(Gen.const(Option.empty[String]),
      Gen.alphaNumStr.map(s => Option(s.take(6)))),
    Gen.oneOf(Gen.const(Option.empty[Long]),
      Gen.chooseNum(-5L, 5L).map(Option(_))))

  test("classification equals brute-force per-key comparison on random snapshot pairs") {
    for (round <- 0 until 5) {
      val keys = (0L until 40L)
      val oldRows = keys.zip(samples(payloadGen, 40, 100L * round))
        .map { case (k, (s, v)) => (k, s, v) }
      // mutate: drop some keys, change some payloads, add new keys
      val dropped = keys.filter(_ % 7 == round % 7).toSet
      val changedKeys = keys.filter(_ % 5 == round % 5).toSet
      val newPayloads = samples(payloadGen, 40, 999L * (round + 1))
      val newRows =
        oldRows.filterNot(r => dropped(r._1)).map {
          case (k, s, v) if changedKeys(k) =>
            val (s2, v2) = newPayloads(k.toInt)
            (k, s2, v2)
          case r => r
        } ++ (100L until 100L + round + 1).map(k => (k, Option("new"), Option(k)))

      val oldDf = oldRows.toDF("k", "s", "v")
      val newDf = newRows.toDF("k", "s", "v")
      val got = SnapshotDiff.diff(oldDf, newDf, Seq("k"), includeUnchanged = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

      val oldM = oldRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val newM = newRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val expect = (oldM.keySet ++ newM.keySet).map { k =>
        k -> ((oldM.get(k), newM.get(k)) match {
          case (Some(_), None) => "removed"
          case (None, Some(_)) => "added"
          case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
          case _ => sys.error("unreachable")
        })
      }.toMap
      assert(got == expect, s"round $round")
    }
  }

  test("diffDetailed changed_cols equals brute-force column comparison") {
    for (round <- 0 until 3) {
      val oldRows = (0L until 30L).zip(samples(payloadGen, 30, 7L * round))
        .map { case (k, (s, v)) => (k, s, v) }
      val newPayloads = samples(payloadGen, 30, 31L * (round + 1))
      val newRows = oldRows.map {
        case (k, s, v) if k % 3 == 0 =>
          val (s2, v2) = newPayloads(k.toInt)
          (k, s2, v2)
        case r => r
      }
      val got = SnapshotDiff.diffDetailed(
          oldRows.toDF("k", "s", "v"), newRows.toDF("k", "s", "v"),
          Seq("k"), Seq("s", "v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
      val oldM = oldRows.map(r => r._1 -> r).toMap
      newRows.foreach { case (k, s2, v2) =>
        val (_, s1, v1) = oldM(k)
        val expect = Set(
          if (s1 != s2) Some("s") else None,
          if (v1 != v2) Some("v") else None).flatten
        if (expect.nonEmpty)
          assert(got(k) == expect, s"round $round key $k")
        else
          assert(!got.contains(k), s"round $round key $k should be unchanged")
      }
    }
  }
}
