package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

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

  test("scd2History: intervals chain, current row open, duplicate " +
       "version collapsed by tie-break") {
    val log = Seq(
      (1L, 1L, "a", 0), (1L, 2L, "b-low", 0), (1L, 2L, "b-high", 1),
      (1L, 3L, "c", 0),
      (2L, 5L, "only", 0))
      .toDF("doc_id", "version", "payload", "prov")
    val got = Snapshot.scd2History(log, "doc_id", "version", "prov")
      .select("doc_id", "version", "payload", "valid_from", "valid_to",
        "is_current")
      .orderBy("doc_id", "valid_from")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, "a", 1L, Some(2L), false),
      (1L, 2L, "b-high", 2L, Some(3L), false), // prov=1 wins the tie
      (1L, 3L, "c", 3L, None, true),
      (2L, 5L, "only", 5L, None, true)))
  }

  test("scd2History: an as-of lookup at each version returns that " +
       "version's row") {
    val log = Seq((1L, 10L, "v10"), (1L, 20L, "v20"), (1L, 30L, "v30"))
      .toDF("doc_id", "version", "payload")
    val hist = Snapshot.scd2History(log, "doc_id", "version")
    for ((asOf, want) <- Seq(10L -> "v10", 15L -> "v10", 20L -> "v20",
        99L -> "v30")) {
      val r = hist.filter(col("valid_from") <= asOf &&
          (col("valid_to").isNull || col("valid_to") > asOf))
        .select("payload").as[String].collect().toSeq
      assert(r == Seq(want), s"as-of $asOf")
    }
  }

  test("upsert rejects mismatched schemas loudly") {
    val cur = Seq((1L, 1L)).toDF("doc_id", "version")
    val upd = Seq((1L, 1L, "x")).toDF("doc_id", "version", "extra")
    val e = intercept[IllegalArgumentException] {
      Snapshot.upsert(cur, upd, "doc_id", "version")
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("diff: added/removed/changed emitted, unchanged suppressed") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "v")
    val got = Snapshot.diff(before, after, "doc_id")
      .select(col("doc_id"), col("change"),
        col("before.v").as("vb"), col("after.v").as("va"))
      .as[(Long, String, Option[String], Option[String])]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "removed", Some("c"), None),
      (4L, "added", None, Some("d"))))
  }

  test("diff rejects mismatched column sets loudly") {
    val b = Seq((1L, "a")).toDF("doc_id", "v")
    val a = Seq((1L, "a", 1L)).toDF("doc_id", "v", "extra")
    val e = intercept[IllegalArgumentException] {
      Snapshot.diff(b, a, "doc_id")
    }
    assert(e.getMessage.contains("column sets differ"))
  }

  test("diff accepts a column-REORDERED after side (same set)") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("doc_id", "v", "n")
    val after = Seq((10L, "a", 1L), (21L, "B", 2L))
      .toDF("n", "v", "doc_id") // same columns, different order
    val got = Snapshot.diff(before, after, "doc_id")
      .select(col("doc_id"), col("change")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq((2L, "changed")))
  }

  test("diff rejects a payload-less (id-only) table with a clear error") {
    val b = Seq(Tuple1(1L)).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Snapshot.diff(b, b, "doc_id")
    }
    assert(e.getMessage.contains("non-id payload column"))
  }

  test("asOf: probes resolve to the interval containing t; probes " +
       "before the first version get no row") {
    val log = Seq((1L, 10L, "v10"), (1L, 20L, "v20"), (2L, 15L, "w15"))
      .toDF("doc_id", "version", "payload")
    val hist = Snapshot.scd2History(log, "doc_id", "version")
    val probes = Seq((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L),
      (1L, 99L), (2L, 14L), (2L, 15L)).toDF("doc_id", "t")
    val got = Snapshot.asOf(hist, probes, "doc_id", "t")
      .select(col("doc_id"), col("t"), col("payload"))
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L, "v10"), (1L, 19L, "v10"),
      (1L, 20L, "v20"), (1L, 99L, "v20"), (2L, 15L, "w15")))
  }

  test("asOf rejects a non-history frame loudly") {
    val notHist = Seq((1L, 1L)).toDF("doc_id", "version")
    val probes = Seq((1L, 1L)).toDF("doc_id", "t")
    val e = intercept[IllegalArgumentException] {
      Snapshot.asOf(notHist, probes, "doc_id", "t")
    }
    assert(e.getMessage.contains("scd2History"))
  }

  test("asOfVersion: historical payloads read back, tombstones erase " +
       "from their version onward, later ids are invisible earlier") {
    // id 1: v1 "a" then v2 "b"; id 2: v1 live then v2 tombstone;
    // id 3: born at v3
    val log = corpus((1L, 1L, "a", false), (1L, 2L, "b", false),
      (2L, 1L, "x", false), (2L, 2L, "x", true), (3L, 3L, "z", false))
    def at(k: Long) = Snapshot
      .asOfVersion(log, "doc_id", "version", k, deletedCol = "deleted")
      .select(col("doc_id"), col("payload"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(at(1L) == Seq((1L, "a"), (2L, "x")))
    assert(at(2L) == Seq((1L, "b")))          // tombstone erased id 2
    assert(at(3L) == Seq((1L, "b"), (3L, "z"))) // id 3 born
  }

  test("asOfVersion == upsert restricted to the version prefix " +
       "(time travel replays the merge history)") {
    val log = corpus((1L, 1L, "a", false), (1L, 2L, "b", false),
      (2L, 1L, "x", false), (2L, 3L, "x", true), (3L, 2L, "z", false))
    val prefix = log.filter(col("version") <= 2L)
    val viaUpsert = Snapshot.upsert(prefix.limit(0), prefix,
        "doc_id", "version", deletedCol = "deleted")
      .select(col("doc_id"), col("payload"))
      .as[(Long, String)].collect().toSeq.sorted
    val viaAsOf = Snapshot
      .asOfVersion(log, "doc_id", "version", 2L, deletedCol = "deleted")
      .select(col("doc_id"), col("payload"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(viaAsOf == viaUpsert && viaAsOf ==
      Seq((1L, "b"), (2L, "x"), (3L, "z")))
  }

}
