package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class CachePinningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pin() materializes the cache EAGERLY — before any consumer") {
    // the invariant behind the round-9 race fix: a pin's blocks must
    // exist before the returned query's concurrent consumers (broadcast
    // threads) can touch the frame. Build an operator query but run NO
    // action on it: the pinned projection must already be cached.
    spark.catalog.clearCache()
    Dedup.releaseCaches(blocking = true)
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"))
      .toDF("doc_id", "text")
    val q = Dedup.lshNearDups(docs, "doc_id", "text") // no action taken
    val cachedRdds = spark.sparkContext.getRDDStorageInfo
      .filter(_.numCachedPartitions > 0)
    assert(cachedRdds.nonEmpty,
      "pin() returned an unmaterialized cache — concurrent first " +
        "consumers would race to compute it")
    assert(Dedup.pinnedCount > 0)
    q.collect() // the query itself still works off the warm pin
    Dedup.releaseCaches(blocking = true)
    assert(Dedup.pinnedCount == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "releaseCaches left cached entries behind")
  }
}
