package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bfs, GraphOps, SerialBfs}
import graft.sources.EdgeListSource

/** End-to-end runs on the reference's OWN committed datasets
  * (read-only at /root/reference/datasets), validating against the
  * facts verified in SURVEY.md §0.1 by executing the reference code. */
class ReferenceDatasetSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val datasets = "/root/reference/datasets"

  test("tinyG.txt: 13 vertices, ecc(0)=2, distances match serial baseline") {
    val edges = EdgeListSource.load(spark, s"$datasets/tinyG.txt")
    val raw = edges.as[(Long, Long)].collect().toSeq
    assert(raw.length == 15)
    val got = Bfs.run(GraphOps.symmetrize(edges), 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 13)
    assert(got.values.max == 2) // SURVEY §0.1: converges in 3 MR rounds
    val serial = SerialBfs.distances(raw ++ raw.map(e => (e._2, e._1)), 0L)
    assert(got == serial)
  }

  test("smallG.txt: 250 vertices, max dist 13 from vertex 0, all reached") {
    val edges = EdgeListSource.load(spark, s"$datasets/smallG.txt")
    val raw = edges.as[(Long, Long)].collect().toSeq
    assert(raw.length == 1273)
    val got = Bfs.run(GraphOps.symmetrize(edges), 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 250)      // connected: every vertex reached
    assert(got.values.max == 13) // SURVEY §0.1: 14 MR rounds = ecc+1
    val serial = SerialBfs.distances(raw ++ raw.map(e => (e._2, e._1)), 0L)
    assert(got == serial)
    // distance histogram is a stable golden signature of the dataset
    val hist = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(hist(0L) == 1 && hist.values.sum == 250)
  }
}
