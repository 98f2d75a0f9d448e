package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Bfs, GraphOps, SerialBfs}
import graft.sources.SyntheticGraphs

class SyntheticGraphsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The generator's closed form, replayed serially — the independent
    * construction the engine-side spark.range build is checked against. */
  private def serialEdges(n: Long, e: Long): Seq[(Long, Long)] = {
    val tree = (1L until n).map(i => (i, (i - 1) / 64))
    val chords = (0L until (e - (n - 1))).map(j =>
      ((j * 1103515245L + 12345L) % n, (j * 2654435761L + 98765L) % n))
    tree ++ chords
  }

  test("published scale points: exact vertex/edge counts and full reach") {
    for ((nV, nE) <- Seq(SyntheticGraphs.MediumG, SyntheticGraphs.LargeG)) {
      val g = SyntheticGraphs.referenceScale(spark, nV, nE)
      assert(g.count() === nE)
      // every vertex id is in range; the tree guarantees 0..nV-1 all
      // appear as src (i >= 1) or dst (0), so the graph spans exactly
      // the published vertex set
      val ids = g.select(explode(array($"src", $"dst")).as("id"))
        .agg(min($"id"), max($"id"), count_distinct($"id"))
        .as[(Long, Long, Long)].head()
      assert(ids === ((0L, nV - 1, nV)))
    }
  }

  test("engine BFS histogram matches SerialBfs on the same generator " +
      "(small instance), and ecc(0) <= 4 holds at mediumG") {
    val (n, e) = (500L, 3000L)
    val engine = Bfs.run(GraphOps.symmetrize(
        SyntheticGraphs.referenceScale(spark, n, e)), source = 0L)
      .groupBy("dist").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val serial = SerialBfs.distances(
        serialEdges(n, e).flatMap { case (a, b) => Seq((a, b), (b, a)) },
        source = 0L)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(engine === serial)
    // the construction proof: tree depth bounds ecc(0); chords only
    // shrink — validate the bound the 5-layer oracle relies on, on the
    // full mediumG instance (serial, ~1s)
    val (mn, me) = SyntheticGraphs.MediumG
    val medDists = SerialBfs.distances(
      serialEdges(mn, me).flatMap { case (a, b) => Seq((a, b), (b, a)) }, 0L)
    assert(medDists.size === mn, "mediumG must be connected from 0")
    assert(medDists.values.max <= 4L)
  }

  test("referenceScaleEdges (the shared serial helper) matches the " +
      "independent replay — CrossoverSweep's baseline cannot drift") {
    val (n, e) = (500L, 3000L)
    assert(SyntheticGraphs.referenceScaleEdges(n, e) === serialEdges(n, e))
  }

  test("generator rejects under-specified shapes") {
    intercept[IllegalArgumentException] {
      SyntheticGraphs.referenceScale(spark, 10L, 5L)
    }
  }
}
