package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r20 optimization gate for the one-exchange canonical staging
  * (Louvain.stageCanonical, SpanningForest's canonical edge set):
  * `repartition(src)` FIRST, then a distinct/groupBy on (src, dst),
  * must plan as ONE exchange — HashPartitioning(src) satisfies
  * ClusteredDistribution(src, dst) (equal pairs are co-located), so the
  * dedup aggregate rides the staging exchange. This is load-bearing
  * planner behavior: if a Spark upgrade stops recognizing the subset
  * partitioning, the staging silently pays two exchanges again. */
class StagedDistinctPlanSpec extends AnyFunSuite with SparkTestBase {

  /** Exchange count with AQE off (deterministic pre-execution plan);
    * the session flag is restored afterwards. */
  private def exchanges(build: => org.apache.spark.sql.DataFrame): Int = {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try build.queryExecution.executedPlan.collect { case e: Exchange => e }.size
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("repartition(src) then distinct on (src, dst) plans one exchange") {
    val n = exchanges(spark.range(1000)
      .select((col("id") % 13).as("src"), (col("id") % 7).as("dst"))
      .repartition(col("src"))
      .distinct())
    assert(n == 1,
      s"expected the distinct to ride the src repartition; got $n exchanges")
  }

  test("repartition(src) then groupBy(src, dst).min plans one exchange") {
    val n = exchanges(spark.range(1000)
      .select((col("id") % 13).as("src"), (col("id") % 7).as("dst"),
        (col("id") % 97).as("weight"))
      .repartition(col("src"))
      .groupBy(col("src"), col("dst")).agg(min(col("weight")).as("weight")))
    assert(n == 1,
      s"expected the canonical groupBy to ride the src repartition; " +
        s"got $n exchanges")
  }
}
