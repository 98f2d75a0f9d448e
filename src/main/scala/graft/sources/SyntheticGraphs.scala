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
  /** Deterministic DIRECTED fixture for the SCC face: 48 rings (sizes
    * 5/6/7/8 cycling inside 26-vertex blocks of four — ids 0..311),
    * entry→entry condensation edges r → r+1 and r → 2r+1 (doubling
    * shortcuts keep the forward diameter logarithmic in the ring
    * count — the color fixpoint's round bound), a 16-vertex
    * singleton chain with the same doubling (ids 312..327, each its
    * own SCC), a bridge from ring 47's entry into the chain, and a
    * max-id source M = 328 feeding ring 0. Ids INCREASE along every
    * condensation edge except M's, so the coloring decomposition
    * resolves in exactly TWO peel rounds — round 1 floods everything
    * with M's color and extracts only {M} (nothing reaches back);
    * round 2 makes every ring its own color class and every
    * singleton a pivot — while still exercising multi-size cyclic
    * SCCs, trivial SCCs, the class-restricted reverse reach and the
    * peel. Closed-form answer: comp = the vertex's ring-segment
    * maximum (g·26 + {4, 10, 17, 25}), or itself past the rings. */
  def sccFixtureEdges: Seq[(Long, Long)] = {
    val segs = Seq((0, 5), (5, 11), (11, 18), (18, 26))
    val rings = for {
      g <- 0 until 12
      (a, b) <- segs
      base = g * 26 + a
      e <- (base until base + (b - a) - 1).map(v => (v.toLong, v + 1L)) :+
        ((base + (b - a) - 1).toLong, base.toLong)
    } yield e
    def entry(r: Int): Long = (r / 4) * 26L + Seq(0, 5, 11, 18)(r % 4)
    val chain = (0 until 47).map(r => (entry(r), entry(r + 1)))
    val dbl = (0 until 48).filter(r => 2 * r + 1 < 48)
      .map(r => (entry(r), entry(2 * r + 1)))
    val singles = (0 until 15).map(i => (312L + i, 313L + i)) ++
      (0 until 16).filter(i => 2 * i + 1 <= 15)
        .map(i => (312L + i, 312L + 2 * i + 1))
    rings ++ chain ++ dbl ++
      Seq((entry(47), 312L)) ++ singles ++ Seq((328L, 0L))
  }

  /** [[sccFixtureEdges]] as a DataFrame (329 vertices — driver-built;
    * the fixture is condensation-structure, not scale: the operator's
    * scale story is its round shape, measured on the face). */
  def sccFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sccFixtureEdges.toDF("src", "dst")
  }

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
