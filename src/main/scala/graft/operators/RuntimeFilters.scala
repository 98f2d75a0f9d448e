package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime (bloom-filter) join pruning — the optimizer-injected
  * semijoin reduction that matters most at 100 TB: when a selective
  * dimension filter survives into a shuffle join, Spark can build a
  * bloom filter over the dimension's join keys and push a
  * `might_contain` probe into the FACT side's scan/shuffle, so the
  * overwhelming majority of fact rows are dropped BEFORE the exchange
  * instead of after it. The join result is exactly the same — a bloom
  * filter admits false positives only, and the equi-join still applies
  * — which is why the face can sit under the hash gate at all.
  *
  * Beyond-reference capability (the reference has no joins at all —
  * SURVEY.md §2.2); this is the knob a 1000-executor deployment turns
  * when a 100 TB fact ⋈ filtered-dim join shuffles 99% dead rows.
  */
object RuntimeFilters {

  /** Run `f` with `confs` applied, restoring previous values after —
    * gate faces must not leak session-conf changes into the next
    * query. */
  private def withConfs[A](spark: SparkSession,
                           confs: Map[String, String])(f: => A): A = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Selective-dim ⋈ fact rollup with the injected bloom filter
    * *enforced*: part rows with `p_size <= maxSize` (a selective
    * predicate the optimizer can see) join lineitem on the part key as
    * a SHUFFLE join (broadcast disabled — at 100 TB neither side
    * broadcasts, and a broadcast join needs no runtime filter: its
    * probe side never shuffles), and the physical plan must carry a
    * `might_contain` probe on the lineitem side. The two size
    * thresholds are widened for gate-SF data — at production scale the
    * DEFAULTS (10 MB creation side, 10 GB application side) already
    * admit exactly this shape.
    *
    * Returns per-size order counts and revenue, bit-identical to the
    * plain join (bloom = false-positive-only pre-filter). */
  def bloomPrunedJoinFace(spark: SparkSession, dir: String,
                          maxSize: Int = 2): DataFrame =
    withConfs(spark, Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // gate SFs are far below the production defaults; thresholds
      // widened so the rule sees the same "small filtered dim, big
      // fact" shape it would at scale
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val pt = spark.read.parquet(s"$dir/part.parquet")
        .where(col("p_size") <= maxSize)
        .select("p_partkey", "p_size")
      val agg = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty_sum"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("p_size")
      val plan = agg.queryExecution.executedPlan.toString
      require(plan.contains("might_contain"),
        "runtime bloom filter was NOT injected into the fact side — " +
          s"the shuffle join would move every dead fact row:\n$plan")
      // materialize INSIDE the conf scope: the restored broadcast
      // threshold must not replan the checkpointed result
      agg.localCheckpoint(true)
    }

  /** FileSourceScan nodes reachable through AQE stages: collect()
    * does not descend into a materialized QueryStageExec's plan, so
    * an executed adaptive plan hides every scan from a naive walk. */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
    }.flatten

  /** Dynamic partition pruning — the third runtime-filtering lever
    * (bloom semijoin = row-level, AQE skew split = exchange-level,
    * DPP = DIRECTORY-level): a star-schema join where the selective
    * predicate lives on a dim ATTRIBUTE (`tier`), not the join key,
    * so neither static pushdown nor constraint propagation can prune
    * the fact scan — only the runtime subquery over the filtered
    * dim's keys can. At 100 TB this is the difference between
    * listing/reading 2 partition directories and the whole fact
    * table whenever the fact is date/category-partitioned and the
    * filter arrives through a dimension.
    *
    * Everything runs under PRODUCTION-DEFAULT confs — no scaffolding:
    * DPP and exchange reuse are on by default, the dim broadcast is
    * the hint any star join would carry. Two require gates, both on
    * the EXECUTED plan:
    *
    *  1. typed: the fact scan's partitionFilters carry a
    *     [[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]]
    *     (the `event_type IN dynamicpruning#N` probe);
    *  2. measured: the scan's runtime metrics prove files were
    *     skipped at EXECUTION time — `numPartitions` equals the
    *     matching-tier partition count and `numFiles` <
    *     `staticFilesNum` (the pre-pruning listing).
    *
    * The dim is written to (and read back from) parquet deliberately:
    * a literal LocalRelation dim is pre-evaluated by
    * ConvertToLocalRelation, which erases the selective Filter node
    * the DPP rule requires — measured; the parquet round-trip is the
    * real star-schema shape anyway. */
  def dppJoinFace(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.sources.TableLayout.freshTmp("graft_dpp_")
    try {
      graft.streaming.EventStream.eventsTable(spark, dir)
        .select("event_id", "user_id", "event_type")
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(s"$tmp/fact")
      Seq(("purchase", "rev"), ("signup", "acq"), ("click", "eng"),
          ("view", "eng"), ("error", "ops"))
        .toDF("event_type", "tier")
        .write.mode("overwrite").parquet(s"$tmp/dim")
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim")
        .where(col("tier").isin("rev", "acq"))
      val agg = fact.join(broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("event_id")).as("min_event_id"),
          max(col("event_id")).as("max_event_id"))
        .orderBy("event_type")
      val qe = agg.queryExecution
      // materialize BEFORE the gates: gate 2 reads runtime metrics
      val out = agg.localCheckpoint(true)
      val factScan = allScans(qe.executedPlan)
        .filter(_.partitionFilters.nonEmpty) match {
        case Seq(s) => s
        case other => sys.error(
          s"expected exactly one partitioned fact scan, got ${other.size}")
      }
      require(factScan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
        "no DynamicPruningExpression in the fact scan's partition " +
          s"filters — DPP was not injected: ${factScan.partitionFilters}")
      val m = factScan.metrics
      require(m("numPartitions").value == 2 &&
        m("numFiles").value < m("staticFilesNum").value,
        "DPP did not prune at execution time: read " +
          s"${m("numPartitions").value} partitions, " +
          s"${m("numFiles").value}/${m("staticFilesNum").value} files")
      out
    } finally graft.sources.TableLayout.rmTree(tmp)
  }
}
