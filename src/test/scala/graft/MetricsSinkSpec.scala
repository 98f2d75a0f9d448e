package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MetricsSink

class MetricsSinkSpec extends AnyFunSuite {

  test("append writes header only on creation, then appends rows") {
    val dir = Files.createTempDirectory("graft-metrics")
    val path = dir.resolve("results.csv").toString
    MetricsSink.append(path, "tinyG", 4, 1.25)
    MetricsSink.append(path, "smallG", 8, 2.5)
    val lines = Files.readAllLines(Paths.get(path))
    assert(lines.size() == 3)
    assert(lines.get(0) == MetricsSink.Header)
    assert(lines.get(1) == "tinyG,4,1.25")
    assert(lines.get(2) == "smallG,8,2.5")
  }
}
