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
}
