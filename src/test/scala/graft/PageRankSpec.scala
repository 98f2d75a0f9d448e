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

  /** In-memory personalized power iteration. */
  private def pprOracle(edges: Seq[(Long, Long)], srcs: Set[Long],
                        iters: Int, d: Double): Map[Long, Double] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = verts.map(v =>
      v -> (if (srcs(v)) 1.0 / srcs.size else 0.0)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for (u <- verts; v <- adj.getOrElse(u, Nil))
        contrib(v) += rank(u) / out(u)
      rank = verts.map(v => v ->
        ((if (srcs(v)) (1.0 - d) / srcs.size else 0.0) + d * contrib(v))).toMap
    }
    rank
  }

  test("personalized: matches in-memory restart iteration; mass " +
      "concentrates near the seeds") {
    val edges = GraphOps.symmetrize(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("src", "dst"))
    val edgeSeq = edges.as[(Long, Long)].collect().toSeq
    val got = PageRank.personalized(edges, Seq(1L), iterations = 10)
      .as[(Long, Double)].collect().toMap
    val exp = pprOracle(edgeSeq, Set(1L), 10, 0.85)
    got.foreach { case (v, r) => assert(math.abs(r - exp(v)) < 1e-6, s"v=$v") }
    // proximity semantics: rank decays monotonically along the path
    assert(got(1L) > got(2L) && got(2L) > got(4L) && got(4L) > got(7L))
  }

  test("personalized: absent source fails loudly") {
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(Seq((1L, 2L)).toDF("src", "dst"), Seq(99L))
    }
    assert(e.getMessage.contains("absent"))
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
