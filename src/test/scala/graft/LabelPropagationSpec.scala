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
}
