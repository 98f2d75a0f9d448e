package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Redaction

/** Semantics of the PII scrub the driver oracle exercises only on the
  * synthetic overlay: real-shaped corner cases (phone inside an email's
  * local part, digit runs longer than a phone, nulls, multiplicity). */
class RedactionSpec extends AnyFunSuite with SparkTestBase {

  private def run(texts: (Long, String)*): Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    Redaction.redactPii(texts.toDF("id", "text"), "text")
      .orderBy("id")
      .select("id", "n_emails", "n_phones", "redacted")
      .as[(Long, Long, Long, String)].collect().toSeq
  }

  test("counts and replaces emails and phones") {
    val Seq((_, e, p, red)) =
      run(1L -> "mail bob@x.com or call 555-123-4567 today")
    assert(e == 1L && p == 1L)
    assert(red == "mail <EMAIL> or call <PHONE> today")
  }

  test("phone-shaped local part counts as one email, zero phones") {
    val Seq((_, e, p, red)) = run(1L -> "reach 555-123-4567@x.com now")
    assert(e == 1L && p == 0L)
    assert(red == "reach <EMAIL> now")
  }

  test("digit runs without word boundaries are not phones") {
    // no position inside the run is a word boundary, so \b\d{3}- never
    // anchors
    val Seq((_, e, p, red)) = run(1L -> "id 12345-678-90123 is fine")
    assert(e == 0L && p == 0L)
    assert(red == "id 12345-678-90123 is fine")
  }

  test("multiple matches per row; null text scrubs to empty") {
    val out = run(1L -> "a@b.co then c@d.co and 555-000-1111 555-222-3333",
                  2L -> null)
    assert(out(0) == (1L, 2L, 2L,
      "<EMAIL> then <EMAIL> and <PHONE> <PHONE>"))
    assert(out(1) == (2L, 0L, 0L, ""))
  }

  test("overlay plants zero/one/many matches deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = (0L to 30L).map(i => (i, "base text")).toDF("doc_id", "text")
    val got = Redaction.redactPii(
        d.select(col("doc_id"),
          Redaction.piiOverlay(col("text"), col("doc_id")).as("text")),
        "text")
      .select("doc_id", "n_emails", "n_phones")
      .as[(Long, Long, Long)].collect()
      .map { case (i, e, p) => i -> ((e, p)) }.toMap
    // expectations derived from the operator's own overlay constants —
    // an overlay edit shifts both sides together
    val expected = (0L to 30L).map { i =>
      i -> ((1L + (if (i % Redaction.OverlayEmail2EveryMod == 0) 1L else 0L),
             if (i % Redaction.OverlayPhoneEveryMod != 0) 1L else 0L))
    }.toMap
    assert(got == expected)
  }

  test("purge drops exactly the requested keys, duplicates included") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val req = Seq(2L, 3L, 99L).toDF("req_id") // 99 targets nothing
    val survived = Redaction.purge(df, "id", req, "req_id")
      .select("id").as[Long].collect().toSeq.sorted
    assert(survived == Seq(1L, 4L))
  }

  test("purgeCascade audits corpus + derived tables consistently") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    // derived table: 2 rows per doc (chunks shape)
    val chunks = (1L to 10L).flatMap(i => Seq((i, 0), (i, 1)))
      .toDF("doc_id", "chunk_id")
    val req = Seq(2L, 5L, 5L).toDF("req_id") // duplicate request rows
    val got = Redaction.purgeCascade(
        Seq(("chunks", chunks, "doc_id"), ("docs", docs, "doc_id")),
        req, "req_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("chunks", 20L, 4L, 16L), ("docs", 10L, 2L, 8L)))
  }

  test("purgeCascade past the broadcast gate degrades to a shuffle " +
      "anti-join with identical audits") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    val req = Seq(2L, 5L).toDF("req_id")
    // threshold 0: every request set is "too big to broadcast" — the
    // 10^8-key purge path, exercised without 10^8 keys
    val got = Redaction.purgeCascade(Seq(("docs", docs, "doc_id")),
        req, "req_id", broadcastRequestRows = 0L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("docs", 10L, 2L, 8L)))
  }

  test("purgeCascade with an empty request set purges nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "v")
    val req = Seq.empty[Long].toDF("req_id")
    val got = Redaction.purgeCascade(Seq(("docs", docs, "doc_id")),
        req, "req_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("docs", 1L, 0L, 1L)))
  }

  test("kAnonymize: small cells merge into one '*' bucket; every " +
       "released cell clears k; no unsafe cells -> no bucket row") {
    import spark.implicits._
    // cells: (a,x)=3, (a,y)=1, (b,x)=2 with k=3 -> only (a,x) safe
    val rows = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq.fill(2)(("b", "x"))
    try {
      val got = Redaction.kAnonymize(rows.toDF("q1", "q2"),
          Seq("q1", "q2"), k = 3)
        .orderBy("q1", "q2")
        .as[(String, String, Long, Boolean)].collect().toSeq
      assert(got == Seq(("*", "*", 3L, true), ("a", "x", 3L, false)))
      assert(got.filterNot(_._4).forall(_._3 >= 3)) // the k guarantee

      val allSafe = Redaction.kAnonymize(
          rows.filter(_ != (("a", "y"))).toDF("q1", "q2"),
          Seq("q1", "q2"), k = 2)
        .as[(String, String, Long, Boolean)].collect().toSeq
      assert(allSafe.length == 2 && allSafe.forall(!_._4),
        s"expected the identity release, got $allSafe")
    } finally Redaction.releaseCaches(blocking = true)
  }
}
