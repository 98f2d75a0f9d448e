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
object Redaction {

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

  /** Deterministic PII overlay for the driver query: the synthetic
    * corpus carries no PII, so the query plants a reproducible email
    * (and, on `id % 3 != 0`, a phone; a second email on `id % 5 == 0`)
    * derived from the id — exercising zero/one/many matches per row.
    * Generated here so the DuckDB oracle builds the identical string.
    */
  def piiOverlay(textCol: Column, idCol: Column): Column = {
    val phone = concat(lit(" call 555-"),
      lpad((pmod(idCol, lit(900)) + 100).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(idCol * 7, lit(10000)).cast("string"), 4, "0"))
    val email2 = concat(lit(" cc admin"), idCol.cast("string"),
      lit("@corp.example.org"))
    concat(textCol, lit(" contact user"), idCol.cast("string"),
      lit("@example.com"),
      when(pmod(idCol, lit(3)) =!= 0, phone).otherwise(lit("")),
      when(pmod(idCol, lit(5)) === 0, email2).otherwise(lit("")))
  }
}
