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
}
