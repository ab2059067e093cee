package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ReconcileOps

/** Snapshot reconciliation ([[graft.operators.ReconcileOps]]): the
  * bucket-pruned diff must equal the naive full diff, the digest must
  * catch content changes invisible to row counts, pruning must track
  * drift locality, and floor-division bucketing must hold for negative
  * keys.
  */
class ReconcileSpec extends SparkTestBase {
  import spark.implicits._

  private def snap(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("k", "canon")

  private def diff(a: Seq[(Long, String)], b: Seq[(Long, String)],
      width: Long = 10L): Set[(Long, String)] =
    ReconcileOps.snapshotDiff(snap(a), snap(b), width)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("identical snapshots diff empty, zero mismatched buckets") {
    val rows = (0L until 100L).map(k => (k, s"v$k"))
    assert(diff(rows, rows) === Set.empty)
    assert(ReconcileOps.mismatchedBuckets(snap(rows), snap(rows), 10L)
      .count() === 0L)
  }

  test("statuses classify exactly: added, removed, changed") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"))
    val b = Seq((2L, "y"), (3L, "Z"), (4L, "w"))
    assert(diff(a, b) === Set((1L, "removed"), (3L, "changed"),
      (4L, "added")))
  }

  test("equal-count same-bucket content change is caught by the digest") {
    // one row's content flips inside a bucket whose COUNT is unchanged
    // — the case a count-only fingerprint is blind to
    val a = (0L until 10L).map(k => (k, s"v$k"))
    val b = a.updated(4, (4L, "DRIFTED"))
    assert(ReconcileOps.mismatchedBuckets(snap(a), snap(b), 10L)
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
    assert(diff(a, b) === Set((4L, "changed")))
  }

  test("localized drift mismatches only its buckets") {
    // 1000 keys, width 10 → 100 buckets; drift confined to [40, 60)
    // plus one insert far away → exactly 3 mismatched buckets, and
    // identical rows inside them do NOT reach the output
    val a = (0L until 1000L).map(k => (k, s"v$k"))
    val b = a.map { case (k, v) =>
        if (k >= 40L && k < 60L) (k, "AMENDED") else (k, v) } :+
      (5000L, "new")
    val mism = ReconcileOps.mismatchedBuckets(snap(a), snap(b), 10L)
      .collect().map(_.getLong(0)).toSet
    assert(mism === Set(4L, 5L, 500L))
    val d = diff(a, b)
    assert(d.size === 21)
    assert(d.count(_._2 == "changed") === 20)
    assert(d === ((40L until 60L).map((_, "changed")).toSet + ((5000L, "added"))))
  }

  test("negative keys bucket by floor division") {
    // -1 and 1 are one apart but belong to buckets -1 and 0; a
    // truncating division would fold them both into bucket 0 and an
    // asymmetric drift probe could then miss — assert the bucket ids
    // directly, and that a change at a negative key is found
    val a = Seq((-15L, "p"), (-1L, "q"), (1L, "r"))
    val b = Seq((-15L, "P"), (-1L, "q"), (1L, "r"))
    val mism = ReconcileOps.mismatchedBuckets(snap(a), snap(b), 10L)
      .collect().map(_.getLong(0)).toSet
    assert(mism === Set(-2L))
    assert(diff(a, b) === Set((-15L, "changed")))
  }
}
