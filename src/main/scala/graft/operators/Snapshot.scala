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
