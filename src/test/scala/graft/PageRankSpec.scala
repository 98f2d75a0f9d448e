package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphOps, PageRank}

class PageRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** In-memory power iteration with the same formula. */
  private def oracle(edges: Seq[(Long, Long)], iters: Int,
                     d: Double): Map[Long, Double] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = verts.size
    var rank = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for (u <- verts; v <- adj.getOrElse(u, Nil))
        contrib(v) += rank(u) / out(u)
      rank = verts.map(v => v -> ((1.0 - d) / n + d * contrib(v))).toMap
    }
    rank
  }

  test("matches in-memory power iteration on a directed graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 4L))
    val got = PageRank.run(edges.toDF("src", "dst"), iterations = 10)
      .as[(Long, Double)].collect().toMap
    val exp = oracle(edges, 10, 0.85)
    assert(got.keySet == exp.keySet)
    // fixed-point accumulation truncates at 1e-15 per contribution
    got.foreach { case (v, r) => assert(math.abs(r - exp(v)) < 1e-6, s"v=$v") }
  }

  test("undirected star: center outranks leaves; ranks sum to ~1") {
    val star = GraphOps.symmetrize(
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst"))
    val got = PageRank.run(star).as[(Long, Double)].collect().toMap
    assert(got(0L) > got(1L))
    assert((got(1L) - got(4L)).abs < 1e-12) // symmetric leaves tie
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // no dangling: mass conserved
  }

  test("byte-deterministic across runs (decimal accumulation)") {
    val edges = (1 to 200).map(i => ((i % 17).toLong, (i % 13).toLong))
    val a = PageRank.run(edges.toDF("src", "dst")).as[(Long, Double)]
      .collect().toMap
    val b = PageRank.run(edges.toDF("src", "dst")).as[(Long, Double)]
      .collect().toMap
    assert(a == b) // exact equality, not approx
  }
}
