package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot-sampled centrality: per-vertex distances to a small fixed
  * pivot set (one [[Bfs]] pass per pivot) and the harmonic-centrality
  * estimate Σ 1/d(p, v) over the pivots — the standard sampling
  * estimator for closeness/harmonic centrality (Eppstein-Wang; what
  * the exact O(|V|·|E|) all-pairs form relaxes to at scale).
  *
  * Scale design: cost is exactly k BFS passes — each one exchange per
  * round over the co-partitioned edge table (the [[Bfs]] discipline),
  * state one row per vertex per pivot. k is a constant chosen by the
  * analyst (dozens), never |V|. For whole-graph neighborhood
  * functions at 100 TB the HLL-counter route (HyperBall: one
  * cardinality sketch per vertex, |V|·log log |V| state) is the
  * published alternative; the pivot estimator is the exact-arithmetic
  * face of the same question and is hash-gateable, which HLL floats
  * are not.
  *
  * Harmonic (not classic closeness 1/Σd): defined on disconnected
  * graphs — an unreachable pivot contributes 0, not ∞ (the reason
  * Boldi-Vigna recommend harmonic outright).
  *
  * (Beyond-reference capability: the reference computes one BFS from
  * one hardcoded source, `BFS_map_reduce.py:109`; centrality is what
  * those distance maps are FOR in an analytics stack.)
  */
object Centrality {

  /** Distances to each pivot (left-joined — null = unreachable) and
    * the harmonic sum over reachable pivots, for EVERY vertex of the
    * (symmetrized) edge table. Output: (id, dist_0..dist_{k-1},
    * harmonic DOUBLE); per-row arithmetic only, so the double is
    * bit-deterministic across engines. */
  def pivotHarmonic(edges: DataFrame, pivots: Seq[Long]): DataFrame = {
    require(pivots.nonEmpty, "need at least one pivot")
    require(pivots.distinct.size == pivots.size, s"duplicate pivots: $pivots")
    val spark = edges.sparkSession
    import spark.implicits._
    // vertex universe: on a symmetrized table `src` alone covers every
    // endpoint — one distinct pass
    val verts = edges.select($"src".as("id")).distinct()
    val dists = pivots.zipWithIndex.map { case (p, i) =>
      Bfs.run(edges, p).select($"id", $"dist".as(s"dist_$i"))
    }
    // id-keyed left joins: each BFS result is |V|-sized and hash-joins
    // on the vertex id — k small joins, no pairwise blowup
    val joined = dists.foldLeft(verts)((acc, d) => acc.join(d, Seq("id"), "left"))
    val harmonic = pivots.indices
      .map(i => when(col(s"dist_$i") > 0, lit(1.0) / col(s"dist_$i"))
        .otherwise(lit(0.0)))
      .reduce(_ + _)
    joined.select(
      (col("id") +: pivots.indices.map(i => col(s"dist_$i"))) :+
        harmonic.as("harmonic"): _*)
  }
}
