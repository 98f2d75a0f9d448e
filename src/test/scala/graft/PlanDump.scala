package graft

import org.apache.spark.sql.SparkSession

/** Builder-side plan inspection helper (not a test). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val exec = args.length > 2 && args(2) == "exec"
    for (q <- args(0).split(",")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else println(df.queryExecution.sparkPlan.toString)
    }
    spark.stop()
  }
}
