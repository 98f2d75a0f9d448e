package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphOps, LabelPropagation}

class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.run(GraphOps.symmetrize(edges.toDF("src", "dst")),
        rounds)
      .as[(Long, Long)].collect().toMap

  /** Serial model of one synchronous round: neighbor-majority with
    * min-label tie-break, own label not voting. */
  private def serialRound(adj: Map[Long, Seq[Long]],
                          lbl: Map[Long, Long]): Map[Long, Long] =
    adj.map { case (v, ns) =>
      val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
      v -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
    }

  test("two cliques joined by one bridge edge converge to two communities") {
    val cliqueA = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val cliqueB = for { a <- 10L to 13L; b <- 10L to 13L if a < b } yield (a, b)
    val out = lpa(cliqueA ++ cliqueB ++ Seq((3L, 10L)), rounds = 4)
    // within each clique every member shares a label, and the two
    // cliques carry different labels
    val la = (0L to 3L).map(out).toSet
    val lb = (10L to 13L).map(out).toSet
    assert(la.size == 1 && lb.size == 1 && la != lb)
  }

  test("matches a serial synchronous-LPA model on a fixed graph") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L),
      (2L, 5L), (5L, 6L), (6L, 7L), (7L, 5L))
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var model: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (r <- 1 to 3) {
      model = serialRound(adj, model)
      assert(lpa(edges, r) == model, s"diverged from serial model at round $r")
    }
  }

  test("tie-break is the smallest label (deterministic)") {
    // vertex 9 has two neighbors with distinct labels after round 1;
    // path graph 7-9-8: round 1 gives l(9) = min(7,8) = 7
    val out = lpa(Seq((7L, 9L), (9L, 8L)), rounds = 1)
    assert(out(9L) == 7L)
    assert(out(7L) == 9L && out(8L) == 9L)
  }

  test("rounds must be positive") {
    intercept[IllegalArgumentException] {
      LabelPropagation.run(Seq((0L, 1L)).toDF("src", "dst"), rounds = 0)
    }
  }

  test("modularity: two bridged triangles hand-computed; adversarial " +
       "singleton communities go NEGATIVE with sign-safe truncation") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4; symmetrized |E| = 14
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "label")
    val got = LabelPropagation.modularity(edges, comm)
      .orderBy("label")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // per community: e_c = 6 directed intra, d_c = 7,
    // contrib = 14*6 - 49 = 35; Q = 70/196 = 0.357142…
    assert(got == Seq((1L, 3L, 6L, 7L, 35L, 357142L),
      (4L, 3L, 6L, 7L, 35L, 357142L)))

    // all-singleton assignment: e_c = 0 everywhere, num = -Σd²
    // = -(4+4+9+9+4+4) = -34 → q = -(34e6 div 196) = -173469
    // (truncation toward zero — the sign-safe branch, not floor)
    val single = (1L to 6L).map(i => (i, i)).toDF("id", "label")
    val neg = LabelPropagation.modularity(edges, single)
      .select($"q_micro").distinct().as[Long].collect().toSeq
    assert(neg == Seq(-173469L))
  }
}
