package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Institutionalizes the r16 checkpoint-stats discovery (see
  * `GraphOps.freshStats`): `localCheckpoint` INHERITS the plan's
  * Statistics, and joins MULTIPLY children's sizeInBytes, so a
  * self-joining checkpointed loop compounds the stat exponentially —
  * until the driver spends seconds per round in BigInteger
  * multiplication. The first test pins the FAILURE MODE (so a Spark
  * upgrade that fixes inheritance upstream surfaces here); the second
  * pins the FIREWALL's contract — if a future edit drops
  * `freshStats` from a loop ([[graft.operators.SpanningForest]],
  * [[graft.operators.ConnectedComponents.runStarContraction]]), the
  * bounded-stats property it relies on is the one asserted here. */
class StatsFirewallSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // pointer-doubling over an 8-cycle: p(c) = c mod 8 + 1. The join key
  // (b.c) is UNIQUE, so the self-join is a permutation — row count is
  // CONSTANT every round (only the plan stats can grow). A non-unique
  // key here would square the DATA too and the test would never finish.
  private val ring = (1L to 8L).map(c => (c, c % 8L + 1L))

  private def selfJoinRound(df: DataFrame): DataFrame =
    df.as("a").join(df.as("b"), col("a.p") === col("b.c"))
      .select(col("a.c").as("c"), col("b.p").as("p"))

  private def statsBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  test("failure mode: an unfirewalled self-joining checkpoint loop " +
      "compounds plan sizeInBytes exponentially") {
    var st = ring.toDF("c", "p").localCheckpoint(true)
    val bits0 = math.max(statsBits(st), 8)
    for (_ <- 1 to 8) st = selfJoinRound(st).localCheckpoint(true)
    // sizeInBytes roughly SQUARES per round (bit length doubles):
    // 8 rounds ≈ 256x the starting bit length. Anything >32x proves
    // compounding (a bounded scheme could only add constant bits).
    assert(st.count() === 8L, "the ring join must stay row-preserving")
    assert(statsBits(st) > 32 * bits0,
      s"expected compounding stats; got ${statsBits(st)} bits from " +
        s"$bits0 — if a Spark upgrade stopped localCheckpoint stats " +
        "inheritance, freshStats and this spec can both be retired")
  }

  test("GraphOps.freshStats pins per-round stats at the bounded default") {
    var stC = ring.toDF("c", "p").localCheckpoint(true)
    var st = GraphOps.freshStats(stC)
    val perRound = (1 to 8).map { _ =>
      stC = selfJoinRound(st).localCheckpoint(true)
      st = GraphOps.freshStats(stC)
      statsBits(st)
    }
    // constant across rounds (no compounding) and small in absolute
    // terms: one defaultSizeInBytes (~2^63) — never a squared chain
    assert(st.count() === 8L)
    assert(perRound.distinct.size === 1,
      s"per-round stats must be a constant, got $perRound")
    assert(perRound.head <= 256,
      s"bounded default expected, got ${perRound.head} bits")
  }
}
