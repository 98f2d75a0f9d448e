package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic graphs at the reference's PUBLISHED scale
  * points. The reference benchmarks BFS on three datasets — tinyG
  * (13/13), smallG (250/1273), mediumG (77,360/905,468) and largeG
  * (325,729/1,497,134 — `Presentazione.pdf` slide 23) — but only the
  * two small blobs ship in the repo (`datasets/` holds tinyG.txt and
  * smallG.txt; the large ones are absent). A user reproducing "the
  * same BFS at the published scales" needs graphs with those exact
  * vertex/edge counts; this generator synthesizes them
  * DETERMINISTICALLY so the DuckDB oracle can rebuild the identical
  * graph from the same integer arithmetic and hash-gate the result.
  *
  * Construction (all closed-form, no RNG):
  *  - vertices 0..N-1;
  *  - a branching-64 tree rooted at 0: edge (i, (i-1) div 64) for
  *    every i ≥ 1 — N-1 edges, depth ≤ ⌈log₆₄ N⌉ (= 3 for mediumG,
  *    4 for largeG), so ecc(0) ≤ 4 BY CONSTRUCTION;
  *  - E-(N-1) hash chords (j·1103515245+12345 mod N,
  *    j·2654435761+98765 mod N) — well-mixed long-range edges that
  *    give the graph a realistic exploding frontier. Chords can only
  *    SHRINK distances, so the ecc(0) ≤ 4 bound survives them and a
  *    5-layer unrolled min-merge oracle is provably past the BFS
  *    fixed point (the q_bfs_smallg_golden bounded-equivalence
  *    argument, but with a proof instead of a measurement).
  *
  * The shallow-diameter + exploding-frontier shape is also the
  * realistic one: web/social/co-purchase graphs at 100 TB have
  * diameter O(log N), and the frontier history (1 → 64+chords →
  * tens of thousands → rest) exercises exactly the broadcast-to-
  * shuffle frontier transition `Bfs.Config.broadcastFrontierRows`
  * gates.
  *
  * Scale shape: both branches are `spark.range` — Spark's parallel
  * leaf — projected through codegen'd integer arithmetic; no driver
  * materialization, no skew (the tree key (i-1) div 64 is
  * 64-bucketed per parent; chords are hash-uniform). Overflow
  * headroom: j < 1.5e6 keeps j·2654435761 < 4e15 ≪ 2^63.
  */
object SyntheticGraphs {

  /** mediumG's published (nodes, edges). */
  val MediumG: (Long, Long) = (77360L, 905468L)
  /** largeG's published (nodes, edges). */
  val LargeG: (Long, Long) = (325729L, 1497134L)

  /** Directed edge list (`src`, `dst`) with exactly `nEdges` rows over
    * vertices 0..nVerts-1; symmetrize for the undirected BFS. */
  def referenceScale(spark: SparkSession, nVerts: Long,
                     nEdges: Long): DataFrame = {
    require(nVerts >= 2 && nEdges >= nVerts - 1,
      s"need nVerts >= 2 and nEdges >= nVerts-1; got $nVerts/$nEdges")
    require(nEdges < 1000000000L, s"chord hash headroom: $nEdges")
    val tree = spark.range(1, nVerts)
      .select(col("id").as("src"), expr("(id - 1) div 64").as("dst"))
    val chords = spark.range(nEdges - (nVerts - 1))
      .select(expr(s"(id * 1103515245 + 12345) % $nVerts").as("src"),
        expr(s"(id * 2654435761 + 98765) % $nVerts").as("dst"))
    tree.unionByName(chords)
  }

  /** Driver-side replay of [[referenceScale]]'s closed form — the SAME
    * integer arithmetic, materialized as a Seq for serial baselines
    * ([[graft.CrossoverSweep]]'s n_Workers=0 runs) so the two
    * constructions cannot drift if the generator constants change.
    * `SyntheticGraphsSpec` cross-checks this against an independent
    * hand replay. Driver-memory bounded: only call at the reference's
    * published scales (≤ 1.5M edges). */
  def referenceScaleEdges(nVerts: Long, nEdges: Long): Seq[(Long, Long)] = {
    require(nVerts >= 2 && nEdges >= nVerts - 1,
      s"need nVerts >= 2 and nEdges >= nVerts-1; got $nVerts/$nEdges")
    require(nEdges < 1000000000L, s"chord hash headroom: $nEdges")
    (1L until nVerts).map(i => (i, (i - 1) / 64)) ++
      (0L until (nEdges - (nVerts - 1))).map(j =>
        ((j * 1103515245L + 12345L) % nVerts,
          (j * 2654435761L + 98765L) % nVerts))
  }
}
