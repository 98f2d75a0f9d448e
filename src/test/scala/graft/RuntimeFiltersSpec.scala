package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilters

class RuntimeFiltersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bloomPrunedJoinFace matches the plain join (bloom is result-invisible)") {
    val got = RuntimeFilters.bloomPrunedJoinFace(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val pt = spark.read.parquet(s"$dir/part.parquet")
      .where($"p_size" <= 2)
    val expected = li.join(pt, $"l_partkey" === $"p_partkey")
      .groupBy($"p_size")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty_sum"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("p_size")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dppJoinFace matches the plain star join (DPP is " +
      "result-invisible) and selects exactly the rev/acq tiers") {
    // the face's own require gates already enforce injection +
    // measured pruning on this execution — a throw here IS a failure
    val got = RuntimeFilters.dppJoinFace(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expected = graft.streaming.EventStream.eventsTable(spark, dir)
      .where($"event_type".isin("purchase", "signup"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1) == Seq("purchase", "signup"))
  }

  test("the face restores every session conf it touches") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    RuntimeFilters.bloomPrunedJoinFace(spark, dir).collect()
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after == before,
      "gate face leaked a session-conf change into the next query")
  }
}
