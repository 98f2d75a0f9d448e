package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dag

class DagSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Serial longest-path layering by relaxation to fixpoint. */
  private def serial(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var layer = verts.map(v => (v, 0L)).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((u, v) <- edges) {
        val cand = layer(u) + 1
        if (cand > layer(v)) { layer += (v -> cand); changed = true }
      }
    }
    layer
  }

  test("longestPathLayers matches the serial relaxation on a branchy " +
       "DAG with mid-level sources") {
    // diamond chains + a level-2 source (no in-edges) feeding level 3:
    // its layer restarts at 0 and its successors take the MAX over
    // both provenances
    val edges = Seq[(Long, Long)](
      (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (10L, 5L),            // mid-level source 10 also feeds 5
      (5L, 6L), (2L, 6L),   // 6 takes max(layer(5)+1, layer(2)+1)
      (20L, 21L))           // disjoint 2-chain
    val out = Dag.longestPathLayers(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(out == serial(edges))
    // spot values: 1->0, 4->2 (via 1-2-4 or 1-3-4), 5->3, 6->4, 10->0
    assert(out(1L) == 0L && out(4L) == 2L && out(5L) == 3L &&
      out(6L) == 4L && out(10L) == 0L && out(21L) == 1L)
  }

  test("a cycle fails loudly at the round cap instead of hanging") {
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 1L))
    val e = intercept[IllegalStateException] {
      Dag.longestPathLayers(edges.toDF("src", "dst"), maxRounds = 8)
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("empty edge table returns an empty layering") {
    val out = Dag.longestPathLayers(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(out.count() == 0L)
  }

  test("the q_topo_layers generator produces a genuine multi-layer " +
       "spread with sources at interior levels") {
    val out = SparkEntry.queries("q_topo_layers")(spark, "unused")
      .as[(Long, Long)].collect()
    // depth reaches the last level, and some interior vertex sits at
    // a layer strictly below its level index (a mid-level source
    // restarted the count) — the construction is not the trivial
    // layer == level map
    assert(out.map(_._2).max == 11L, s"max layer ${out.map(_._2).max}")
    assert(out.exists { case (v, l) => l < v / 500 },
      "every vertex had layer == level: sparsifier did nothing")
    val m = out.toMap
    assert(m.size == out.length)
  }
}
