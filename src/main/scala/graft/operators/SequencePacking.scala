package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training-batch construction: group a
  * corpus into fixed token-budget packs (sequences), shard-parallel.
  *
  * Two faces with different guarantees:
  *
  *  - [[packGreedy]] — EXACT greedy first-fit-in-order packing:
  *    within a shard, documents are taken in `orderCol` order and a
  *    pack closes when the next document would overflow the budget
  *    (documents longer than the budget get a pack of their own).
  *    Sequential state per shard → `flatMapGroups`; parallel across
  *    shards, which is the natural layout (a shard = one training
  *    file/stream). This is the semantics trainers actually use.
  *
  *  - [[packByPrefixSum]] — windowed prefix-sum approximation:
  *    pack_id = floor(exclusive-running-token-sum / budget). One
  *    window pass, fully declarative (no per-group state), and
  *    mirrored exactly by SQL window functions — the oracle-gated
  *    face. Differs from greedy in that a document "spanning" a
  *    budget boundary still joins the pack its prefix sum lands in,
  *    so packs can overflow by up to one document's tokens (bounded,
  *    documented; identical when every shard's token total fits one
  *    pack or documents are budget-aligned).
  *
  * Scale notes (100 TB): both faces shuffle ONCE on the shard key.
  * Greedy's per-shard state is O(1) (running total), so a shard of any
  * row count streams through `flatMapGroups` without materializing the
  * group — but rows of one shard land on one task: shard by something
  * with enough cardinality (lang × source × date, not lang alone) to
  * use the cluster's width.
  */
object SequencePacking {

  /** Exact greedy packing. Output = input columns + `pack_id` (0-based
    * per shard) + `pack_tokens` (running tokens of the doc's pack up
    * to and including it).
    *
    * @param shardCol  independent packing domain (one task per shard)
    * @param orderCol  total order within the shard (ties broken by it
    *                  being unique, e.g. doc_id)
    * @param tokenCol  per-document token count (LONG-castable)
    * @param budget    max tokens per pack (> 0) */
  def packGreedy(df: DataFrame, shardCol: String, orderCol: String,
                 tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("pack_id") && !df.columns.contains("pack_tokens"),
      "input already has a pack_id/pack_tokens column")
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_tokens", LongType, nullable = false)))
    val shardIdx = inSchema.fieldIndex(shardCol)
    val orderIdx = inSchema.fieldIndex(orderCol)
    val tokenIdx = inSchema.fieldIndex(tokenCol)
    // fail fast on order types whose in-task comparison would diverge
    // from the column's SQL ordering (a String.valueOf fallback would
    // SILENTLY pack doubles/timestamps in lexicographic order)
    import org.apache.spark.sql.types.{IntegerType, LongType => LT, StringType}
    val orderIsNumeric = inSchema(orderIdx).dataType match {
      case LT | IntegerType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"orderCol $orderCol must be long, int, or string; got $other")
    }
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val keyEnc = org.apache.spark.sql.Encoders.STRING
    implicit val rowEnc = enc

    df.groupByKey(r => String.valueOf(r.get(shardIdx)))(keyEnc)
      .flatMapGroups { (_, rows) =>
        // greedy needs order; within-shard sort is the only per-group
        // materialization (a production shard is sized for one task)
        val sorted = rows.toVector.sortBy { r =>
          val v = r.get(orderIdx)
          if (orderIsNumeric) (v.asInstanceOf[java.lang.Number].longValue(), "")
          else (0L, v.asInstanceOf[String])
        }
        var packId = 0L
        var used = 0L
        var first = true
        sorted.iterator.map { r =>
          val t = r.get(tokenIdx) match {
            // Number covers every JVM numeric Spark materializes
            // (Long/Integer/Double/BigDecimal/...) — the contract is
            // "LONG-castable", not a closed type list
            case n: java.lang.Number => n.longValue()
            case null => 0L
          }
          if (!first && used + t > budget) { packId += 1; used = 0L }
          used += t
          first = false
          Row.fromSeq(r.toSeq ++ Seq(packId, used))
        }
      }
  }

  /** Declarative prefix-sum packing (the oracle-gated face): pack_id =
    * floor(exclusive running token sum / budget) per shard in
    * `orderCol` order. Integer-exact (LONG sums — no float binning). */
  def packByPrefixSum(df: DataFrame, shardCol: String, orderCol: String,
                      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("pack_id"),
      "input already has a pack_id column")
    // collision-free temp name: withColumn would silently REPLACE (and
    // drop would then delete) a same-named user column
    val cumCol = Iterator.from(0).map(i => s"__cum$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokenCol).cast("long")).over(w)
    // floor-division via pmod: Long `/` in Spark is DOUBLE division,
    // whose rounding can cross an integer for large sums — this stays
    // integer-exact at any magnitude (and mirrors the oracle's `//`)
    val excl = col(cumCol) - col(tokenCol).cast("long")
    df.withColumn(cumCol, cum)
      .withColumn("pack_id",
        ((excl - pmod(excl, lit(budget))) / budget).cast("long"))
      .drop(cumCol)
  }
}
