package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphOps, RandomWalk}

class RandomWalkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // a 12-vertex cycle with chords: every vertex has degree >= 4, so
  // walks always have real choices to make
  private def graph() = {
    val n = 12L
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 3) % n))
    }.toDF("src", "dst")
    GraphOps.symmetrize(edges)
  }

  test("walks: every step follows a real edge, paths start at the " +
       "seed and have steps+1 vertices") {
    val e = graph()
    val edgeSet = e.as[(Long, Long)].collect().toSet
    val got = RandomWalk.walks(e, walksPerVertex = 2, steps = 3)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.size == 24) // 12 vertices x 2 walks
    got.foreach { case (walkId, seed, fin, path) =>
      val vs = path.split(",").map(_.toLong).toSeq
      assert(vs.size == 4, s"walk $walkId length")
      assert(vs.head == seed && vs.last == fin, s"walk $walkId endpoints")
      vs.sliding(2).foreach { case Seq(a, b) =>
        assert(edgeSet((a, b)), s"walk $walkId uses non-edge ($a,$b)")
      }
    }
  }

  test("negativeSamples: never an edge, never self, <= k per vertex, " +
       "deterministic; a vertex adjacent to the pool emits fewer") {
    val e = graph()
    val edgeSet = e.as[(Long, Long)].collect().toSet
    def run() = RandomWalk.negativeSamples(e, k = 3, candidatePool = 8)
      .as[(Long, Int, Long)].collect().toSeq.sorted
    val got = run()
    assert(got == run(), "negative samples are not deterministic")
    got.foreach { case (id, _, neg) =>
      assert(neg != id, s"self-pair for $id")
      assert(!edgeSet((id, neg)), s"($id,$neg) is a real edge")
    }
    val perVertex = got.groupBy(_._1).view.mapValues(_.size)
    assert(perVertex.values.forall(_ <= 3))
    assert(perVertex.size == 12, "every vertex got negatives")
    // degree 4 out of 12 vertices, pool 8: some vertex must see part
    // of its pool eaten by its own neighborhood yet still find 3 — and
    // the rank column is contiguous from 1
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1 to rows.size))
    }
  }

  test("walks: deterministic across runs; the two walks of a seed " +
       "diverge; choices are not just the minimum neighbor") {
    val e = graph()
    def run() = RandomWalk.walks(e, walksPerVertex = 2, steps = 3)
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    val a = run()
    assert(a == run(), "walks are not deterministic")
    // per seed, walk 0 and walk 1 should not all be identical — the
    // walk id salts the choice hash
    val bySeed = a.groupBy(_._2).values.map(_.map(_._4).distinct.size)
    assert(bySeed.count(_ > 1) >= 6,
      "walks of the same seed almost never diverge — walk_id not mixing")
    // and the choices must not collapse to 'always the smallest
    // neighbor' (the linear-hash failure corpusShuffle hit)
    val minGreedy = a.count { case (_, seed, _, path) =>
      val vs = path.split(",").map(_.toLong).toSeq
      vs.sliding(2).forall { case Seq(u, v) =>
        v == Seq((u + 1) % 12, (u + 3) % 12, (u + 11) % 12, (u + 9) % 12)
          .min
      }
    }
    assert(minGreedy < a.size / 4,
      s"$minGreedy/${a.size} walks are min-neighbor-greedy — hash not mixing")
  }

  test("skipGramPairs: window-2 expansion on a known path set") {
    import spark.implicits._
    val walks = Seq((0L, 1L, 4L, "1,2,3,4")).toDF(
      "walk_id", "seed", "final_vertex", "path")
    val got = RandomWalk.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect().toSet
    // pairs: each position i with j in [i-2, i+2], j != i
    val vs = Seq(1L, 2L, 3L, 4L)
    val want = (for {
      i <- vs.indices; j <- vs.indices
      if i != j && math.abs(i - j) <= 2
    } yield (vs(i), vs(j))).groupBy(identity)
      .map { case (p, xs) => (p._1, p._2, xs.size.toLong) }.toSet
    assert(got == want)
  }

  test("walks: superseded per-step frames release their blocks in-loop " +
      "— peak walk state is bounded, the result stays collectable") {
    val sc = spark.sparkContext
    // snapshot, don't sweep: blanket-unpersisting the shared context
    // could strand another suite's localCheckpoint-backed frame
    // (truncated lineage = unrecoverable blocks) — count only RDDs
    // THIS call pins (r14 advice)
    val preIds = sc.getPersistentRDDs.keySet
    val w = RandomWalk.walks(graph(), walksPerVertex = 2, steps = 6)
    // 6 steps ran; only the RETURNED frame's checkpoint RDD may remain
    // (the edge pin and every superseded step were released in-loop)
    val newIds = sc.getPersistentRDDs.keySet -- preIds
    assert(newIds.size <= 1,
      s"expected <= 1 surviving pinned RDD (the result), got ${newIds.size}")
    // and the survivor is genuinely usable
    assert(w.count() == 24L)
  }
}
