package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Louvain phase-1 move steps (Blondel et al. 2008): each vertex
  * greedily re-assigns itself to the neighboring community with the
  * best modularity gain. This is the ASCENT half of the community
  * toolkit — [[LabelPropagation]] spreads labels by frequency,
  * [[LabelPropagation.modularity]] EVALUATES an assignment; this
  * operator IMPROVES one, which is what "community detection" means
  * in the Louvain sense.
  *
  * Synchronous variant, fixed step count: every vertex decides
  * simultaneously against the previous step's assignment (the
  * deterministic BSP form — serial Louvain's sequential sweeps are
  * order-dependent and unreplayable distributed; synchronous sweeps
  * are the standard distributed adaptation, e.g. Que et al. 2015).
  *
  * INTEGER-EXACT gain, so a SQL oracle replays it bit-for-bit
  * (quantize the algorithm): moving v into community c changes
  * modularity by ΔQ = k_{v,c}/m − k_v·Σtot_c'/(2m²) + const(v), with
  * Σtot_c' the community's degree mass without v. Scaling by the
  * positive constant 2m² preserves the argmax and makes every score
  * an exact integer:
  *
  *   score(v, c) = 2m·k_{v,c} − k_v·(Σtot_c − [c = comm(v)]·k_v)
  *
  * Argmax over the neighbor communities ∪ {own} with ties to the
  * smallest community id — `min(struct(-score, comm))`, order-free.
  *
  * Scale shape: per step — one |E| message join riding the cached
  * edge table's src partitioning (the [[LabelPropagation]] round
  * shape), one |E| exchange for k_{v,c}, a |V|-sized Σtot aggregate,
  * and one candidate-set exchange (≤ |E|/2 + |V| rows). State is one
  * row per vertex; no all-pairs, nothing |V|² anywhere.
  *
  * Overflow contract: |score| ≤ 4m², so m must stay below ~1.5e9
  * canonical edges for Long — require-checked (a graph past that
  * needs the gain rescaled, e.g. degrees pre-divided; silently
  * wrapping argmax scores would corrupt every assignment).
  */
object Louvain {

  /** @param edges SYMMETRIZED edge table (`src`, `dst`); self-loops
    *              and duplicate pairs are dropped (simple graph —
    *              modularity's k_v/Σtot bookkeeping assumes it)
    * @param steps fixed number of synchronous move steps (initial
    *              assignment: every vertex its own community)
    * @return DataFrame(id LONG, comm LONG) after `steps` steps */
  /** AQE stays ON by default (measured, sf0.1: task CPU 223 -> 127
    * before the checkpoint swap; the per-step exchanges are
    * candidate-stream-sized and pay scan-sized shuffle-file overhead
    * without coalescing — the KCore shrinking-frame doctrine applies
    * even though the frames here are steady-sized, because they are
    * SMALL relative to shuffle.partitions). */
  /** CAVEAT (r18, measured): the UNGATED synchronous sweep is the
    * published BSP primitive, but its simultaneous moves swap-oscillate
    * — on the copurchase graph it lands BELOW the singleton baseline
    * (Q −1497 → −4807 micro after 2 steps). For community QUALITY use
    * [[twoLevel]], whose parity-gated contracted phase measurably
    * ascends (−4807 → +266015); this primitive face exists for the
    * synchronous-recurrence contract the oracle replays. */
  def moveSteps(edges: DataFrame, steps: Int,
                keepAqe: Boolean = true): DataFrame = {
    require(steps > 0, s"steps must be positive, got $steps")
    GraphOps.withLoopAqeDisabled(edges.sparkSession, keepAqe) {
      runSteps(simpleWeighted(edges), steps)
    }
  }

  /** Two-level Louvain (phase 1 + ONE coarsening pass + phase 1 on
    * the contracted graph — Blondel 2008 §2's alternation, unrolled
    * once): move steps improve the singleton assignment, communities
    * contract to super-vertices (intra-community mass as self-loops,
    * inter-community edge counts as weights), and weighted
    * PARITY-GATED move steps improve the contracted assignment (see
    * `partialMoves` — the ungated synchronous sweep swap-oscillates
    * from the contracted singleton init and measurably LOWERS Q;
    * gated, it lifts the copurchase graph from Q = −4807 micro to
    * +266015 at (2,2), 331 → 133 communities — the q_louvain_gain
    * face gates exactly this claim). Both phases run the SAME
    * integer-exact synchronous core, so the composition stays
    * oracle-replayable.
    *
    * Scale shape: [[coarsen]] is two gated |V|-frame joins + one
    * exchange on the (community, community) key; the phase-2 loop
    * runs on the CONTRACTED graph — |communities| vertices, usually
    * orders of magnitude smaller — so the second phase is nearly free
    * at 100 TB, which is exactly why real Louvain alternates instead
    * of running more flat sweeps.
    *
    * @return DataFrame(id, comm1, comm2): per vertex the phase-1
    *         community and its final (phase-2) community */
  def twoLevel(edges: DataFrame, steps1: Int, steps2: Int,
               keepAqe: Boolean = true): DataFrame = {
    require(steps1 > 0 && steps2 > 0,
      s"steps must be positive, got ($steps1, $steps2)")
    GraphOps.withLoopAqeDisabled(edges.sparkSession, keepAqe) {
      val simple = simpleWeighted(edges)
      val a1 = runSteps(simple, steps1)
      val a2 = runSteps(coarsen(simple, a1), steps2,
        partialMoves = true)
      // the phase-2 map is |communities|-sized — gate like every other
      // |V|-frame join (broadcast under the Bfs ceiling, else
      // shuffle-hash)
      val a2r =
        if (a2.count() <= 4000000L)
          broadcast(a2.select(col("id").as("comm1"),
            col("comm").as("comm2")))
        else a2.select(col("id").as("comm1"), col("comm").as("comm2"))
          .hint("shuffle_hash")
      val out = a1.select(col("id"), col("comm").as("comm1"))
        .join(a2r, "comm1")
        .select(col("id"), col("comm1"), col("comm2"))
        .localCheckpoint(true)
      GraphOps.releaseCheckpointedFrame(a1)
      GraphOps.releaseCheckpointedFrame(a2)
      out
    }
  }

  /** Canonical weighted form of a simple symmetric edge table: drop
    * self-loops and duplicate pairs, weight 1 per direction — the
    * shape [[runSteps]] consumes and [[coarsen]] aggregates. */
  private def simpleWeighted(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("w", lit(1L))

  /** Louvain phase 2's graph contraction: map both endpoints to their
    * communities and sum weights. On a symmetric input each intra-
    * community undirected edge appears in both directions, so the
    * contracted self-loop row (c, c) carries BOTH endpoint
    * contributions (w = 2·intra) — exactly the degree bookkeeping the
    * weighted gain needs (k_c = Σ k of members; 2m preserved).
    * Inter-community rows stay symmetric. Two gated |V|-frame joins +
    * ONE exchange on the community-pair key. */
  private[graft] def coarsen(wEdges: DataFrame,
                             assign: DataFrame): DataFrame = {
    val small = assign.count() <= 4000000L
    def gate(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    wEdges
      .join(gate(assign.select(col("id").as("src"),
        col("comm").as("cs"))), "src")
      .join(gate(assign.select(col("id").as("dst"),
        col("comm").as("cd"))), "dst")
      .groupBy(col("cs").as("src"), col("cd").as("dst"))
      .agg(sum(col("w")).as("w"))
  }

  /** Weighted synchronous move-step core. Input (`src`, `dst`, `w`):
    * symmetric rows for src ≠ dst; self-loop rows (contracted
    * intra-community mass) count in degrees and Σtot but never
    * generate neighbor candidates. The unweighted face is the w = 1
    * special case — one implementation, one oracle recurrence. */
  /** @param partialMoves parity-gate the moves: in step r only
    *        vertices with (id + r) even may leave their community.
    *        The SYNCHRONOUS sweep's known pathology is the swap — a
    *        hub abandons its label in the same step its neighbors
    *        adopt it, and from a SINGLETON init on a small dense
    *        contracted graph that net-LOWERS Q (measured on the
    *        copurchase graph: every (steps1, steps2) config of the
    *        ungated phase 2 lost 550-610 micro-Q). Gating half the
    *        vertices per step is the standard deterministic
    *        distributed remedy (the coloring/partial-move family,
    *        e.g. Que et al. 2015): movers target STATIONARY
    *        communities, so merges are real. Phase 1 stays ungated —
    *        its face/oracle pair predates this and its dynamics from
    *        the |V|-singleton init measurably ascend. */
  private def runSteps(wEdges: DataFrame, steps: Int,
                       partialMoves: Boolean = false): DataFrame = {
    val spark = wEdges.sparkSession
    import spark.implicits._
    // Canonical weighted edge table, src-partitioned for the per-step
    // message join, held as a LOCAL CHECKPOINT rather than a persist:
    // the columnar cache's encode+decode tax dominated this operator's
    // profile (persist(MEMORY_AND_DISK): 56 task-CPU-s to build+degree
    // the 1.2M-row table and ~2x on every per-step read; checkpoint
    // row blocks: 17 — measured at sf0.1, JobProbe). Checkpoint blocks
    // are raw InternalRows: no codec on either side of the loop.
    val e = wEdges.select($"src", $"dst", $"w")
      .repartition($"src")
      .localCheckpoint(false)
    // one materialization supplies 2m AND warms the cache the per-step
    // joins reuse; 2m = total weight INCLUDING self-loops (a
    // super-vertex's internal mass is part of its degree)
    val twoM = e.agg(coalesce(sum($"w"), lit(0L))).head().getLong(0)
    require(twoM <= 3000000000L,
      s"louvain gain overflows Long past ~1.5e9 total weight (2m = " +
        s"$twoM); rescale the gain before running larger graphs")
    // self-loops feed degrees, never messages
    val eMsg = e.filter($"src" =!= $"dst")
    val deg = e.groupBy($"src".as("id")).agg(sum($"w").as("k"))
      .localCheckpoint(true)
    // the per-vertex side tables (state, deg, Σtot — all ≤ |V| rows)
    // join the |E|-sized score stream map-side while |V| is under the
    // Bfs broadcast ceiling; past it every gated join degrades to
    // shuffle-hash instead of OOMing the driver (the betweenness gate)
    val nV = deg.count()
    val small = nV <= 4000000L
    def gated(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    var state = deg.select($"id", $"id".as("comm")).localCheckpoint(true)
    var step = 0
    while (step < steps) {
      step += 1
      val tStep = System.nanoTime()
      // k_{v,c}: per vertex, edge weight into each neighboring
      // community — the LP message shape: each vertex's comm joins on
      // e.SRC (riding the cached src partitioning exchange-free, the
      // table is symmetric) and is delivered to e.dst. ONE exchange
      // (the groupBy).
      val kin = state.as("a").hint("shuffle_hash")
        .join(eMsg.as("e"), col("a.id") === col("e.src"))
        .select(col("e.dst").as("id"), col("a.comm"), col("e.w"))
        .groupBy($"id", $"comm").agg(sum($"w").as("kvc"))
      // Σtot_c: community degree mass under the CURRENT assignment —
      // ≤ |V| rows, rides the gated joins below
      val tot = state.join(deg, "id")
        .groupBy($"comm").agg(sum($"k").as("tot"))
      val cur = state.select($"id", $"comm".as("cur"))
      // neighbor-community candidates: score rides kin MAP-SIDE (three
      // gated |V|-frame joins — no further |E| exchange)
      val nbrCand = kin
        .join(gated(cur), "id")
        .join(gated(deg), "id")
        .join(gated(tot), "comm")
        .select($"id", $"comm",
          (lit(twoM) * $"kvc" -
            $"k" * ($"tot" -
              when($"comm" === $"cur", $"k").otherwise(lit(0L))))
            .as("score"))
      // own-community candidate, synthesized as a zero-k_vc row from
      // the |V|-sized state (own may be absent from kin when v has no
      // edge into its own community). When kin DOES carry the own
      // community, both rows survive into the argmax and the real row
      // always scores ≥ its zero-k_vc duplicate (2m·k_vc ≥ 0, same
      // comm) — the argmax dedupes them for free, which is what lets
      // this avoid the distinct-candidate-set exchange entirely.
      val ownCand = state
        .join(gated(deg), "id")
        .join(gated(tot), "comm")
        .select($"id", $"comm",
          (-$"k" * ($"tot" - $"k")).as("score"))
      // argmax by (score DESC, comm ASC) — min(struct), order-free;
      // the step's SECOND and last exchange
      val argmax = nbrCand.union(ownCand).groupBy($"id")
        .agg(min(struct((-$"score").as("ns"), $"comm".as("c"))).as("m"))
        .select($"id", $"m.c".as("comm"))
      // parity gate: non-movers keep their community this step — one
      // extra gated |V|-frame join, no new exchange
      val newState = (if (partialMoves)
          argmax.join(gated(cur), "id")
            .select($"id",
              when((($"id" + step) % 2) === 0, $"comm")
                .otherwise($"cur").as("comm"))
        else argmax)
        .localCheckpoint(true)
      System.err.println(
        f"[louvain] step $step ${(System.nanoTime() - tStep) / 1e9}%.2fs")
      GraphOps.releaseCheckpointedFrame(state)
      state = newState
    }
    GraphOps.releaseCheckpointedFrame(e)
    // deg is loop-resident too — the returned state is a flat
    // checkpoint, so nothing recomputes through deg (r17 ADVICE leak)
    GraphOps.releaseCheckpointedFrame(deg)
    state
  }
}
