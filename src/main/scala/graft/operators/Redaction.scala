package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything leaves the raw zone (emails, phone
  * numbers; the pattern family extends to SSNs, IPs, credit cards the
  * same way).
  *
  * Beyond the reference's surface (BFS_map_reduce.py has no text
  * pipeline); the pattern set is the public-rule family used by C4 and
  * friends (regex scrub, not an NER model — models don't fit a
  * zero-dependency engine, and the regex tier is what runs at full
  * corpus scale even in pipelines that also run NER on a sample).
  *
  * Shape at 100 TB: pure per-row projection — `regexp_count` /
  * `regexp_replace` are codegen'd Catalyst expressions, zero UDFs,
  * zero exchanges; redaction runs at scan speed alongside whatever
  * else the curation funnel projects.
  *
  * Patterns deliberately stay inside the regex subset shared by Java's
  * engine (Spark) and RE2 (DuckDB): character classes, bounded
  * repetition, `\b`, `\d` — no lookarounds, no backreferences — so the
  * oracle replays them identically.
  */
object Redaction extends CachePinning {

  /** Conservative RFC-ish email shape; both engines treat it identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 555-123-4567. Word-bounded so digit runs inside
    * longer identifiers don't match. */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"

  /** Adds `n_emails`, `n_phones`, and `redacted` (the scrubbed text) to
    * `df`.
    *
    * Emails are counted and replaced FIRST; phones are counted on the
    * email-redacted text — an email whose local part embeds a
    * phone-shaped digit run (`555-123-4567@x.com`) is one email, not an
    * email plus a phone. The oracle mirrors the same two-stage order.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    // null-safe like the TextAnalysis family: null text scrubs to ""
    val txt = coalesce(col(textCol), lit(""))
    val emailScrubbed = regexp_replace(txt, EmailPattern, EmailToken)
    df.withColumn("n_emails",
        regexp_count(txt, lit(EmailPattern)).cast("long"))
      .withColumn("n_phones",
        regexp_count(emailScrubbed, lit(PhonePattern)).cast("long"))
      .withColumn("redacted",
        regexp_replace(emailScrubbed, PhonePattern, PhoneToken))
  }

  // --- deterministic PII overlay (driver query + its oracle) ---------
  // The synthetic corpus carries no PII, so the driver query plants a
  // reproducible email (and, on `id % PhoneMod != 0`, a phone; a second
  // email on `id % Email2Mod == 0`) derived from the id — exercising
  // zero/one/many matches per row. The Column and SQL forms below are
  // built from THESE shared constants so Scala and DuckDB can't drift.
  private[graft] val OverlayEmail1Prefix = " contact user"
  private[graft] val OverlayEmail1Domain = "@example.com"
  private[graft] val OverlayPhonePrefix = " call 555-"
  private[graft] val OverlayPhoneAreaMod = 900
  private[graft] val OverlayPhoneAreaBase = 100
  private[graft] val OverlayPhoneLineMul = 7
  private[graft] val OverlayPhoneLineMod = 10000
  private[graft] val OverlayPhoneEveryMod = 3 // phone unless id % 3 == 0
  private[graft] val OverlayEmail2Prefix = " cc admin"
  private[graft] val OverlayEmail2Domain = "@corp.example.org"
  private[graft] val OverlayEmail2EveryMod = 5 // 2nd email iff id % 5 == 0

  /** Overlay as a Column. Null-safe like [[redactPii]]: null text
    * overlays onto "" (concat would otherwise null the whole row out —
    * and diverge from the oracle, whose `||` nulls the same way). */
  def piiOverlay(textCol: Column, idCol: Column): Column = {
    val phone = concat(lit(OverlayPhonePrefix),
      lpad((pmod(idCol, lit(OverlayPhoneAreaMod)) + OverlayPhoneAreaBase)
        .cast("string"), 3, "0"), lit("-"),
      lpad(pmod(idCol * OverlayPhoneLineMul, lit(OverlayPhoneLineMod))
        .cast("string"), 4, "0"))
    val email2 = concat(lit(OverlayEmail2Prefix), idCol.cast("string"),
      lit(OverlayEmail2Domain))
    concat(coalesce(textCol, lit("")),
      lit(OverlayEmail1Prefix), idCol.cast("string"),
      lit(OverlayEmail1Domain),
      when(pmod(idCol, lit(OverlayPhoneEveryMod)) =!= 0, phone)
        .otherwise(lit("")),
      when(pmod(idCol, lit(OverlayEmail2EveryMod)) === 0, email2)
        .otherwise(lit("")))
  }

  /** The same overlay as a DuckDB SQL fragment over columns
    * `text`/`doc_id` — generated from the shared constants above. */
  def piiOverlaySql: String = {
    val id = "CAST(doc_id AS VARCHAR)"
    s"coalesce(text, '') || '$OverlayEmail1Prefix' || $id" +
      s" || '$OverlayEmail1Domain'" +
      s" || CASE WHEN doc_id % $OverlayPhoneEveryMod <> 0" +
      s" THEN '$OverlayPhonePrefix'" +
      s" || lpad(CAST(doc_id % $OverlayPhoneAreaMod + $OverlayPhoneAreaBase" +
      s" AS VARCHAR), 3, '0') || '-'" +
      s" || lpad(CAST((doc_id * $OverlayPhoneLineMul) % $OverlayPhoneLineMod" +
      s" AS VARCHAR), 4, '0')" +
      s" ELSE '' END" +
      s" || CASE WHEN doc_id % $OverlayEmail2EveryMod = 0" +
      s" THEN '$OverlayEmail2Prefix' || $id || '$OverlayEmail2Domain'" +
      s" ELSE '' END"
  }

  /** Request-set row count above which the purge joins fall back from
    * broadcast to shuffle (r13 verdict stretch 7 — the Bfs frontier
    * discipline): a pathological request list (a court-ordered purge of
    * 10^8 ids) must degrade to a shuffled anti-join, not OOM the
    * driver assembling a broadcast table. 4M long keys ≈ tens of MB
    * broadcast — the same ceiling the BFS frontier uses. */
  private[graft] val BroadcastRequestRows = 4000000L

  /** Hard-delete a request set from `df`: anti-join on `keyCol`,
    * broadcast while the request list is small. The request list is
    * the small side by nature (deletion requests arrive in thousands,
    * corpora in billions), so at 100 TB this is one map-side pass per
    * table — no shuffle of the corpus; past [[BroadcastRequestRows]]
    * it degrades gracefully to the shuffled anti-join instead of
    * OOMing the driver.
    *
    * The distinct request set is pinned ([[CachePinning]]) before the
    * gate count, so the count job and the anti-join share ONE
    * materialization — without the pin the very 10^8-row list the
    * gate protects against would be scanned and deduped twice.
    * Callers release via [[releaseCaches]] after materializing
    * (Bench/Verify/IsoBench drain it per query). */
  def purge(df: DataFrame, keyCol: String, requests: DataFrame,
            reqCol: String): DataFrame = {
    val (reqs, n) = pinWithCount(requests.select(col(reqCol)).distinct())
    val reqSide = if (n <= BroadcastRequestRows) broadcast(reqs) else reqs
    df.join(reqSide, col(keyCol) === col(reqCol), "left_anti")
  }

  /** Right-to-be-forgotten cascade with audit: propagate one request
    * set across the corpus AND every derived table (chunks, embedding
    * index, …) — the compliance reality that a doc deleted from
    * `documents` alone still lives on in its chunks and vectors.
    *
    * Per table, ONE broadcast-join pass computes the audit row
    * (rows_before, purged, rows_after); the actual purge anti-join is
    * then executed and its surviving count must equal
    * rows_before - purged (require — the audit and the purge can't
    * drift). Output: one audit row per table. */
  def purgeCascade(tables: Seq[(String, DataFrame, String)],
                   requests: DataFrame, reqCol: String,
                   broadcastRequestRows: Long = BroadcastRequestRows)
      : DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    // distinct + pin once; ONE count decides broadcast-vs-shuffle for
    // every per-table pass (the Bfs frontier row-count gate — see
    // [[BroadcastRequestRows]]; parameterized so a spec can force the
    // shuffle path without 4M rows), instead of trusting an unbounded
    // request list into the driver
    val reqKeys = requests.select(col(reqCol).as("__purge_key")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reqSide =
      if (reqKeys.count() <= broadcastRequestRows) broadcast(reqKeys)
      else reqKeys
    try {
    val audits = tables.map { case (label, df, keyCol) =>
      val Array(row) = df
        .join(reqSide, col(keyCol) === col("__purge_key"), "left")
        .agg(count(lit(1)).as("rows_before"),
          coalesce(sum(when(col("__purge_key").isNotNull, 1L)
            .otherwise(0L)), lit(0L)).as("purged"))
        .collect()
      val before = row.getAs[Long]("rows_before")
      val purged = row.getAs[Long]("purged")
      val survived = df.join(reqSide,
        col(keyCol) === col("__purge_key"), "left_anti").count()
      require(survived == before - purged,
        s"$label: purge anti-join left $survived rows but the audit " +
          s"expected ${before - purged}")
      (label, before, purged, before - purged)
    }
    // 1-row-per-table audit — driver-side literal construction, same
    // class as BPE's collected merge list, never data-proportional
    audits.toDF("tbl", "rows_before", "purged", "rows_after")
      .orderBy("tbl")
    } finally reqKeys.unpersist(false)
  }

  /** k-anonymity suppression release (Sweeney 2002): aggregate by the
    * quasi-identifier columns and publish only cells with at least
    * `k` members; every smaller cell is merged into ONE `'*'` bucket
    * — the re-identification audit plus the safe releasable view in
    * one pass, the aggregate-level complement of the row-level
    * [[redactPii]]/[[purge]] family (those remove identifiers; this
    * bounds what the RELEASED AGGREGATE can reveal about any
    * individual).
    *
    * The `'*'` bucket is released at any size: it is the union of
    * rows across many DISTINCT small QI cells, so its count is not
    * attributable to any quasi-identifier combination — unlike a
    * small cell, it identifies nobody. QI values are cast to string
    * for the merge; a literal `'*'` QI value in the data would
    * collide (callers with such data should re-map first).
    *
    * Shape at 100 TB: ONE exchange on the QI tuple with map-side
    * partial aggregation — the shuffle moves at most |QI-space| rows
    * per task, not data rows. The cell frame is pinned: safe filter
    * and bucket rollup are two consumers, and without the pin each
    * would re-run the full corpus aggregation. Everything after the
    * first groupBy is |QI-space|-sized. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    require(k >= 2, s"k must be >= 2, got $k")
    val cells = pin(df
      .groupBy(qiCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("n_rows")))
    val safe = cells.where(col("n_rows") >= k)
      .withColumn("suppressed", lit(false))
    val bucket = cells.where(col("n_rows") < k)
      .agg(sum(col("n_rows")).as("n_rows"))
      .where(col("n_rows").isNotNull) // no unsafe cells -> no bucket row
      .select(qiCols.map(c => lit("*").as(c)) :+ col("n_rows") :+
        lit(true).as("suppressed"): _*)
    safe.unionByName(bucket)
  }
}
