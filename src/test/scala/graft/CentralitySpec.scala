package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Centrality, GraphOps}

class CentralitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pivotHarmonic: distances per pivot, harmonic sum, and the " +
      "disconnected case (unreachable pivot contributes 0, not infinity)") {
    // path 0-1-2 plus a DISCONNECTED edge 5-6
    val edges = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("src", "dst"))
    val got = Centrality.pivotHarmonic(edges, Seq(0L, 5L))
      .orderBy("id")
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(got == Seq(
      (0L, Some(0L), None, 0.0),          // pivot itself + unreachable
      (1L, Some(1L), None, 1.0),
      (2L, Some(2L), None, 0.5),
      (5L, None, Some(0L), 0.0),
      (6L, None, Some(1L), 1.0)))
  }

  test("pivotHarmonic rejects duplicate pivots") {
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Centrality.pivotHarmonic(edges, Seq(3L, 3L))
    }
  }

  test("betweennessSample: path graph — interior vertices accumulate " +
      "the quantized Brandes dependency, the pivot is excluded") {
    // path 0-1-2-3, pivot 0: σ ≡ 1, δq(2) = scale, δq(1) = 2·scale
    val edges = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val got = Centrality.betweennessSample(edges, Seq(0L), scale = 1000L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (1L, 2000L), (2L, 1000L), (3L, 0L)))
  }

  test("betweennessSample: diamond — σ splits halve the dependency " +
      "(integer division, the quantized recurrence)") {
    // square 0-1-3, 0-2-3, pivot 0: σ(3) = 2, δq(1) = δq(2) =
    // (1·(scale+0)) div 2 = scale/2
    val edges = GraphOps.symmetrize(
      Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"))
    val got = Centrality.betweennessSample(edges, Seq(0L), scale = 1000L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (1L, 500L), (2L, 500L), (3L, 0L)))
  }

  test("betweennessSample: two pivots sum; a disconnected component " +
      "contributes nothing across the gap") {
    // path 0-1-2 plus disconnected edge 5-6, pivots 0 and 5
    val edges = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("src", "dst"))
    val got = Centrality.betweennessSample(edges, Seq(0L, 5L), scale = 1000L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // pivot 0: δq(1) = 1000 (bridge to 2); pivot 5: path 5-6 has no
    // interior. Cross-component: zero everywhere.
    assert(got == Seq((0L, 0L), (1L, 1000L), (2L, 0L),
      (5L, 0L), (6L, 0L)))
  }

  test("neighborhoodFunction: deterministic replay; a triangle " +
      "saturates after one round (every sketch = union of all three)") {
    val tri = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst"))
    val a = Centrality.neighborhoodFunction(tri, iters = 2)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Centrality.neighborhoodFunction(tri, iters = 2)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b, "sketch must be deterministic across runs")
    // after round 1 every vertex saw the whole graph; round 2 is a
    // fixed point — and all three vertices hold the SAME union sketch
    assert(a.map(_._2) == a.map(_._3), "round 2 must be a fixed point")
    assert(a.map(_._2).distinct.size == 1, "all sketches must agree")
    assert(a.forall(_._4 > 0L), "estimate must be positive")
  }

  test("neighborhoodFunction: registers only grow round over round " +
      "(element-wise max union is monotone)") {
    val edges = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val rows = Centrality.neighborhoodFunction(edges, iters = 2)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    def reg(packed: Long, k: Int): Long = (packed >> (4 * k)) & 15L
    rows.foreach { case (id, r1, r2, _) =>
      (0 until 12).foreach { k =>
        assert(reg(r2, k) >= reg(r1, k),
          s"vertex $id register $k shrank: ${reg(r1, k)} -> ${reg(r2, k)}")
      }
    }
  }
}
