package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-frontier / maximal-vector) operator: the
  * preference query "all points not dominated by any other" for one
  * minimized and one maximized dimension — cheapest-but-biggest part,
  * fastest-but-freshest replica. Dominance: `b` dominates `a` iff
  * `b.cost <= a.cost AND b.benefit >= a.benefit` with at least one
  * strict inequality (Börzsönyi et al. 2001, "The Skyline Operator").
  *
  * The definitional formulation is an all-pairs NOT EXISTS — O(n²)
  * and designed out (it survives only as the independent oracle). In
  * 2-D the frontier is exactly the strictly-decreasing staircase of
  * the (cost asc, benefit desc) sort: a point is on the skyline iff
  * its benefit strictly exceeds the running maximum over all
  * strictly-preceding points — one sort, one scan.
  *
  * Shape at 100 TB, in two pruning phases, both the SAME staircase
  * scan: phase 1 hash-buckets the points and runs the scan per
  * bucket (window partitioned by bucket — splittable, no global
  * sort); any point dominated inside its bucket is dominated
  * globally, so pruning is safe, and each bucket survives only its
  * local frontier. Phase 2 runs the scan once more over the ∪ of
  * local frontiers — frontier-sized input (typically O(√n·buckets)
  * in expectation, thousands not billions), where the single-task
  * global window is the right plan, not a bottleneck. A
  * globally-undominated point is undominated in every subset, so it
  * survives phase 1 — the two-phase result is EXACT.
  */
object Skyline {

  /** Pareto frontier of `points` — one row per DISTINCT
    * (cost, benefit) point (the caller's aggregation contract;
    * duplicate points would be self-dominated by the tie ordering).
    * All other columns pass through untouched. */
  def skyline2d(points: DataFrame, costCol: String, benefitCol: String,
                pruneBuckets: Int = 32): DataFrame = {
    val cost = col(costCol)
    val ben = col(benefitCol)
    // staircase scan: keep iff benefit strictly exceeds every
    // strictly-preceding point's (preceding = cheaper, or same cost
    // with higher benefit — either way a dominator if >= holds)
    def frontier(df: DataFrame, w: => org.apache.spark.sql.expressions.WindowSpec)
        : DataFrame = {
      val runMax = max(ben).over(w.orderBy(cost.asc, ben.desc)
        .rowsBetween(Window.unboundedPreceding, -1))
      df.withColumn("__rm", runMax)
        .where(col("__rm").isNull || ben > col("__rm"))
        .drop("__rm")
    }
    val local = frontier(
      points.withColumn("__b", pmod(hash(cost, ben), lit(pruneBuckets))),
      Window.partitionBy("__b")).drop("__b")
    frontier(local, Window.partitionBy())
  }
}
