package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphOps, Louvain}

class LouvainSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def move(edges: Seq[(Long, Long)], steps: Int): Map[Long, Long] =
    Louvain.moveSteps(GraphOps.symmetrize(edges.toDF("src", "dst")), steps)
      .as[(Long, Long)].collect().toMap

  /** Serial synchronous move sweep replaying the integer gain. */
  private def serialMove(edges: Seq[(Long, Long)],
                         steps: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(p => p._1 != p._2).distinct
    val twoM = sym.size.toLong
    val deg = sym.groupBy(_._1).map { case (v, xs) => (v, xs.size.toLong) }
    var comm: Map[Long, Long] = deg.keys.map(v => (v, v)).toMap
    for (_ <- 1 to steps) {
      val cur = comm
      comm = deg.keys.map { v =>
        val kvc = sym.collect { case (`v`, u) => cur(u) }
          .groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }
        val cands = kvc.keySet + cur(v)
        val tot = cur.groupBy(_._2).map { case (c, vs) =>
          (c, vs.keys.map(deg).sum)
        }
        val best = cands.map { c =>
          val totP = tot(c) - (if (c == cur(v)) deg(v) else 0L)
          val score = twoM * kvc.getOrElse(c, 0L) - deg(v) * totP
          (-score, c)
        }.min
        (v, best._2)
      }.toMap
    }
    comm
  }

  test("two disjoint triangles each collapse to one community") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val out = move(edges, steps = 2)
    assert(out.filterKeys(_ < 10L).values.toSet.size == 1)
    assert(out.filterKeys(_ >= 10L).values.toSet.size == 1)
    assert(out(1L) != out(10L), "disjoint components never merge")
  }

  test("matches a serial synchronous model on a pseudo-random graph") {
    val edges = for {
      a <- 0L until 24L; b <- 0L until 24L
      if a < b && (a * 13 + b * 7) % 4 == 0
    } yield (a, b)
    assert(move(edges, 1) == serialMove(edges, 1))
    assert(move(edges, 2) == serialMove(edges, 2))
    assert(move(edges, 3) == serialMove(edges, 3))
  }

  test("barbell: communities never cross the bridge") {
    // two K3s joined by one bridge edge (3,4). The synchronous sweep
    // oscillates pairs WITHIN a clique (known BSP-Louvain behavior —
    // the serial-model test pins the exact dynamics); the invariant
    // worth asserting is that no community ever spans the bridge.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    for (steps <- 1 to 3) {
      val out = move(edges, steps)
      val left = Set(out(1L), out(2L), out(3L))
      val right = Set(out(4L), out(5L), out(6L))
      assert(left.intersect(right).isEmpty,
        s"steps=$steps: a community crossed the bridge: $out")
      assert(out == serialMove(edges, steps))
    }
  }

  test("self-loops and duplicate edges are canonicalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L), (2L, 3L))
    assert(move(edges, 1) == serialMove(Seq((1L, 2L), (2L, 3L)), 1))
  }
}
