package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: entry() smoke (rows > 0 at
  * sf0.001, exactly the driver's t1 check) and queries/oracleSql key
  * alignment (an oracle key without a query silently records as "no
  * spark result" in the driver's correctness gate). */
class SparkEntrySpec extends AnyFunSuite with SparkTestBase {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("EVERY query is DuckDB-oracle-gated — zero rows-only entries") {
    // r13: the last two rows-only queries got hash faces — q_pagerank
    // via the unrolled fixed-point recurrence, q_sketch_stats via its
    // bound-satisfaction contract. A new query without an oracle is a
    // regression of the gate, not a documented exception.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
  }

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("BfsApp CLI parsing: reference flags, long forms, defaults") {
    assert(BfsApp.parseArgs(Array("-p", "/x/tiny.txt", "-w", "8")) ==
      Map("path" -> "/x/tiny.txt", "workers" -> "8"))
    assert(BfsApp.parseArgs(Array("--path", "f", "--workers", "2",
      "-s", "7", "-r", "out.csv")) ==
      Map("path" -> "f", "workers" -> "2", "source" -> "7",
        "results" -> "out.csv"))
    assert(BfsApp.parseArgs(Array.empty) == Map.empty)
    // strict: stray tokens and dangling flags error rather than
    // silently shifting the flag/value pairing
    intercept[IllegalArgumentException] {
      BfsApp.parseArgs(Array("-p", "g.txt", "stray", "-w", "8"))
    }
    intercept[IllegalArgumentException] {
      BfsApp.parseArgs(Array("-p", "g.txt", "-w"))
    }
  }
}
