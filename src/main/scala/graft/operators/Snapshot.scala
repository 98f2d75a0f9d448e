package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a versioned corpus: the CDC-style
  * latest-wins merge that keeps a training corpus current as crawl
  * batches, re-processing runs, and takedown requests land — the
  * MERGE INTO of a lakehouse, expressed as a pure relational
  * operator (no table-format dependency).
  *
  * The reference has no notion of updates (its graph is read once —
  * `Graph.py:4-8`); this is a beyond-parity component of the
  * LLM-pipeline bar: at 100 TB you never rebuild the corpus from
  * scratch, you upsert the delta.
  */
object Snapshot {

  /** Latest-wins upsert of `updates` into `current`.
    *
    * Winner per id = highest `(version, provenance)` — provenance
    * breaks version ties in favor of the update stream (a re-emitted
    * row with the same version must not resurrect the old payload).
    * Rows whose winning version carries `deletedCol = true` are
    * dropped AFTER the merge: a tombstone must beat older versions
    * first, then erase the id; filtering tombstones early would
    * resurrect the stale current row.
    *
    * Shape at 100 TB: ONE exchange on the id — the row_number window
    * partitions on `idCol` (cardinality = |corpus|, partition size =
    * that id's version count — the windowing shape that scales). A
    * max(struct(version, payload…)) aggregation would avoid the sort
    * but drops the whole chain into SortAggregate the moment the
    * payload includes a string (the r3 lesson in BASELINE.md);
    * per-id-tiny window sorts beat a corpus-wide SortAggregate.
    */
  def upsert(current: DataFrame, updates: DataFrame, idCol: String,
             versionCol: String, deletedCol: String = ""): DataFrame = {
    require(current.columns.toSeq == updates.columns.toSeq,
      s"snapshot and update schemas differ: ${current.columns.toSeq} " +
        s"vs ${updates.columns.toSeq}")
    val tagged = current.withColumn("_prov", lit(0))
      .unionByName(updates.withColumn("_prov", lit(1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col("_prov").desc)
    val won = tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_prov")
    if (deletedCol.isEmpty) won
    else won.filter(!coalesce(col(deletedCol), lit(false))).drop(deletedCol)
  }

  /** Time-travel read over a version LOG: the corpus state AS OF
    * version `asOf` — exactly [[upsert]]'s latest-wins merge
    * restricted to `version <= asOf`. Rows deleted by a tombstone at
    * or before `asOf` are absent; rows re-processed AFTER `asOf` read
    * back their historical payload. This is the lakehouse
    * `VERSION AS OF k` face (Delta/Iceberg time travel) expressed on
    * the log the versioned-state machinery already keeps.
    *
    * Shape at 100 TB: the version filter is a pushed-down predicate on
    * the log scan (version is a partition/stats column in a real
    * layout, so old-version files prune), then the SAME single
    * id-partitioned exchange as [[upsert]]. */
  def asOfVersion(log: DataFrame, idCol: String, versionCol: String,
                  asOf: Long, deletedCol: String = "",
                  tieBreakCol: String = ""): DataFrame = {
    val order =
      if (tieBreakCol.isEmpty) Seq(col(versionCol).desc)
      else Seq(col(versionCol).desc, col(tieBreakCol).desc)
    val w = Window.partitionBy(col(idCol)).orderBy(order: _*)
    val won = log.filter(col(versionCol) <= asOf)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    if (deletedCol.isEmpty) won
    else won.filter(!coalesce(col(deletedCol), lit(false))).drop(deletedCol)
  }

  /** SCD-type-2 history build: turn a stream of versioned rows into
    * interval rows — each version valid from its own `versionCol`
    * until the next version of the same id (`valid_to` null on the
    * current row, `is_current` flagging it). The time-travel
    * counterpart of [[upsert]]: upsert answers "what is the corpus
    * NOW", the SCD2 table answers "what was it as of version v"
    * (`WHERE valid_from <= v AND (valid_to IS NULL OR valid_to > v)`).
    *
    * Duplicate (id, version) rows are collapsed to one winner first —
    * provenance via `tieBreakCol` descending if given — because two
    * open intervals for one version would make as-of lookups
    * ambiguous.
    *
    * Shape at 100 TB: same single id-partitioned exchange as
    * [[upsert]]; `lead` rides the same window sort that `row_number`
    * uses, so the dedup and the interval build cost ONE shuffle
    * together. */
  def scd2History(versions: DataFrame, idCol: String, versionCol: String,
                  tieBreakCol: String = ""): DataFrame = {
    val order =
      if (tieBreakCol.isEmpty) Seq(col(versionCol).desc)
      else Seq(col(versionCol).desc, col(tieBreakCol).desc)
    val w = Window.partitionBy(col(idCol)).orderBy(order: _*)
    val winners = versions
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev_v", lag(col(versionCol), 1).over(w))
      // the row ABOVE in version-desc order is the successor version
      .filter(col("_rn") === 1 || col("_prev_v") =!= col(versionCol))
    winners
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lag(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_rn", "_prev_v")
  }

  /** Point-in-time probe against a [[scd2History]] table — the lookup
    * the history table exists for: for each `(id, t)` probe row, the
    * one version row valid at `t`, i.e. `valid_from <= t < valid_to`
    * (null `valid_to` = the open/current interval). Probes before an
    * id's first version get NO row (inner join): absence of history
    * is a real answer, not a null payload to misread downstream.
    *
    * Shape at 100 TB: ONE equi-exchange on the id; the interval
    * predicate rides the join as a residual filter. No range
    * explosion is possible — SCD2 intervals of one id are disjoint by
    * construction, so every probe matches at most one history row. */
  def asOf(history: DataFrame, probes: DataFrame, idCol: String,
           tCol: String): DataFrame = {
    require(history.columns.contains("valid_from") &&
      history.columns.contains("valid_to"),
      s"history must be scd2History output, got ${history.columns.toSeq}")
    val h = history.as("h")
    val p = probes.as("p")
    val payload = history.columns.toSeq
      .filterNot(c => c == idCol || c == tCol)
      .map(c => col(s"h.$c"))
    p.join(h, col(s"p.$idCol") === col(s"h.$idCol") &&
        col("h.valid_from") <= col(s"p.$tCol") &&
        (col("h.valid_to").isNull || col("h.valid_to") > col(s"p.$tCol")))
      .select(col(s"p.$idCol").as(idCol) +: col(s"p.$tCol").as(tCol) +:
        payload: _*)
  }

  /** Lakehouse time-travel READ face (r14 verdict item 4): proves a
    * HISTORICAL read is reproducible after later merges land.
    *
    * The versioned-state machinery ([[graft.streaming.StreamHarness]]
    * CDC faces) materializes one state dir per merge; this face
    * completes the read side — "read the table AS OF version k":
    *
    *  1. the q_snapshot_upsert version log is built, and the merge
    *     history is materialized as state dirs `v2` (before the
    *     tombstone batch exists) and `v3` (final);
    *  2. AFTER the final merge has overwritten nothing (immutable
    *     version dirs — the lakehouse invariant), the HISTORICAL `v2`
    *     dir is re-read and require-gated bit-equal (symmetric
    *     except + count) against [[asOfVersion]]'s log-replay at
    *     k = 2 — the two routes to "the table as of version 2"
    *     (stored snapshot vs log replay) must agree;
    *  3. output = both reads tagged `as_of` ∈ {2, 3}: as-of-2 still
    *     shows the rows the v3 tombstones later erased, as-of-3 does
    *     not — the observable time-travel semantics, oracle-replayed.
    *
    * Shape at 100 TB: a time-travel read is ONE scan of the chosen
    * version's files (no replay) — the log-replay side here is the
    * verification harness, not the production read path; asOfVersion
    * itself is one pushed-down version filter + one id exchange. */
  def timeTravelReadFace(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-snap-asof-")
    try {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"))
      def versioned(df: DataFrame, v: Long, deleted: Boolean,
                    prov: Int): DataFrame =
        df.select(col("doc_id"), col("lang"), col("source"),
          lit(v).as("version"), lit(deleted).as("deleted"),
          lit(prov).as("_prov"))
      // the q_snapshot_upsert log, provenance-tagged
      val log = versioned(d, 1L, deleted = false, prov = 0)
        .unionByName(versioned(d.filter(col("doc_id") % 5 === 0)
          .withColumn("lang", lit("und")), 2L, deleted = false, prov = 1))
        .unionByName(versioned(d.filter(col("doc_id") % 17 === 0),
          3L, deleted = true, prov = 1))
        .unionByName(versioned(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L),
          1L, deleted = false, prov = 1))
      def stateAt(k: Long): DataFrame =
        asOfVersion(log, "doc_id", "version", k,
          deletedCol = "deleted", tieBreakCol = "_prov").drop("_prov")
      val v2Dir = root.resolve("state").resolve("v2").toString
      val v3Dir = root.resolve("state").resolve("v3").toString
      stateAt(2L).write.parquet(v2Dir) // the merge history, in order:
      stateAt(3L).write.parquet(v3Dir) // v2 exists BEFORE v3 lands
      // the historical read, AFTER the final merge: stored snapshot
      // must equal log replay — both directions of except, plus count
      // (except alone can't see duplicate-multiplicity drift)
      val reread = spark.read.parquet(v2Dir)
      val replay = stateAt(2L)
      require(reread.count() == replay.count() &&
        reread.except(replay).isEmpty && replay.except(reread).isEmpty,
        "historical v2 read drifted from the log replay at version 2 " +
          "— time travel is not reproducible")
      spark.read.parquet(v2Dir).withColumn("as_of", lit(2L))
        .unionByName(spark.read.parquet(v3Dir).withColumn("as_of", lit(3L)))
        .select(col("as_of"), col("doc_id"), col("lang"), col("source"),
          col("version"))
        .orderBy("as_of", "doc_id")
        .localCheckpoint(true)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverseIterator
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
  }

  /** Change-data feed between two snapshots of the same table: one
    * row per id whose payload was `added`, `removed`, or `changed`
    * from `before` to `after` — the diff a downstream consumer reads
    * to process only the delta (re-embed changed docs, retract
    * removed ones) instead of re-reading 100 TB. Identical rows are
    * NOT emitted: the whole point is that the output is |delta|, not
    * |corpus|.
    *
    * Payload equality is null-safe over all non-id columns. Output:
    * the id, `change`, and the full before/after payloads as structs
    * (null on the absent side), so the consumer needs no join back.
    *
    * Shape at 100 TB: ONE full-outer shuffle join on the id — both
    * sides exchange once on the same key and the comparison is a
    * pure projection. With both snapshots bucketed by id on disk
    * (the layout [[graft.sources]] bucketed tables provide) even
    * that exchange disappears. */
  def diff(before: DataFrame, after: DataFrame, idCol: String): DataFrame = {
    // column SETS must match, not column order (r12 advice): a
    // reordered projection of the same snapshot is diff-safe because
    // both sides are re-selected in before's order below. And a
    // payload-less table fails HERE with a real message — struct() of
    // zero fields would otherwise die at analysis with an opaque error.
    require(before.columns.toSet == after.columns.toSet,
      s"snapshot column sets differ: ${before.columns.toSeq} " +
        s"vs ${after.columns.toSeq}")
    require(before.columns.contains(idCol),
      s"id column '$idCol' not present in ${before.columns.toSeq}")
    val payloadNames = before.columns.toSeq.filterNot(_ == idCol)
    require(payloadNames.nonEmpty,
      s"diff needs at least one non-id payload column (got only '$idCol')")
    val payload = payloadNames.map(col)
    val b = before.select(col(idCol), struct(payload: _*).as("before"))
    val a = after.select(col(idCol), struct(payload: _*).as("after"))
    b.join(a, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("before").isNull, lit("added"))
          .when(col("after").isNull, lit("removed"))
          .when(!(col("before") <=> col("after")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(idCol), col("change"), col("before"), col("after"))
  }
}
