package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshot

class SnapshotSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def corpus(rows: (Long, Long, String, Boolean)*) =
    rows.toDF("doc_id", "version", "payload", "deleted")

  test("upsert: higher version wins; provenance breaks version ties " +
       "toward the update stream") {
    val cur = corpus((1L, 1L, "old-1", false), (2L, 1L, "old-2", false),
      (3L, 2L, "cur-3", false))
    val upd = corpus((1L, 2L, "new-1", false), // higher version wins
      (2L, 1L, "re-2", false), // SAME version: update provenance wins
      (4L, 1L, "new-4", false)) // brand-new id inserted
    val got = Snapshot.upsert(cur, upd, "doc_id", "version", "deleted")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "new-1"), (2L, 1L, "re-2"),
      (3L, 2L, "cur-3"), (4L, 1L, "new-4")))
  }

  test("upsert: a tombstone erases the id — and must beat older " +
       "versions, not be filtered before the merge") {
    val cur = corpus((1L, 1L, "a", false), (2L, 1L, "b", false))
    val upd = corpus((1L, 5L, "tomb", true))
    val got = Snapshot.upsert(cur, upd, "doc_id", "version", "deleted")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    // id 1 gone entirely (not resurrected as version 1), id 2 intact
    assert(got == Seq((2L, 1L, "b")))
  }

  test("upsert: a STALE tombstone loses to a newer live version") {
    val cur = corpus((1L, 3L, "live", false))
    val upd = corpus((1L, 2L, "old-tomb", true))
    val got = Snapshot.upsert(cur, upd, "doc_id", "version", "deleted")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "live")))
  }

  test("upsert without a tombstone column keeps every winning row") {
    val cur = Seq((1L, 1L, "a")).toDF("doc_id", "version", "payload")
    val upd = Seq((1L, 2L, "b")).toDF("doc_id", "version", "payload")
    val got = Snapshot.upsert(cur, upd, "doc_id", "version")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "b")))
  }

  test("upsert rejects mismatched schemas loudly") {
    val cur = Seq((1L, 1L)).toDF("doc_id", "version")
    val upd = Seq((1L, 1L, "x")).toDF("doc_id", "version", "extra")
    val e = intercept[IllegalArgumentException] {
      Snapshot.upsert(cur, upd, "doc_id", "version")
    }
    assert(e.getMessage.contains("schemas differ"))
  }
}
