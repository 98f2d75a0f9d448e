package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphOps, KCore}

class KCoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.peel(GraphOps.symmetrize(edges.toDF("src", "dst")), k)
      .as[(Long, Long)].collect().toMap

  /** Serial peel to fixed point over an undirected edge list. */
  private def serialCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (v, xs) => (v, xs.size) }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).map { case (v, xs) => (v, xs.size) }
  }

  test("K4 with pendant vertices: 3-core is exactly the K4") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    // pendants hang off the clique; a chain tests the peel CASCADE
    // (9 dies only after 8 dies after 7)
    val edges = k4 ++ Seq((0L, 7L), (7L, 8L), (8L, 9L))
    val out = core(edges, k = 3)
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(core(edges, k = 4) == Map.empty)
  }

  test("peel matches a serial fixed-point model on a pseudo-random graph") {
    // deterministic graph: 40 vertices, edges from a hash condition
    val edges = for {
      a <- 0L until 40L; b <- 0L until 40L
      if a < b && (a * 31 + b * 17) % 7 == 0
    } yield (a, b)
    for (k <- Seq(2, 4, 6)) {
      val serial = serialCore(edges, k).map { case (v, d) => (v, d.toLong) }
      assert(core(edges, k) == serial, s"k=$k diverged from serial model")
    }
  }

  test("peelBounded equals peel once the cascade has stabilized, and is " +
      "a strict over-approximation before") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val edges = k4 ++ Seq((0L, 7L), (7L, 8L), (8L, 9L))
    val sym = GraphOps.symmetrize(edges.toDF("src", "dst"))
    // the k=2 cascade is 3 rounds deep: deg(9)=1 dies in round 1,
    // which drops deg(8) to 1 (dies round 2), which drops deg(7) to 1
    // (dies round 3) — stabilizing at the K4. Bounded at 1 round the
    // partially-peeled chain is still present.
    val r1 = KCore.peelBounded(sym, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.contains(8L) && !r1.contains(9L))
    val r4 = KCore.peelBounded(sym, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 == core(edges, k = 2))
  }

  test("arguments are validated") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { KCore.peelBounded(e, k = 0, rounds = 1) }
    intercept[IllegalArgumentException] { KCore.peelBounded(e, k = 1, rounds = 0) }
  }
}
