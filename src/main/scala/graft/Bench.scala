package graft

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

object Bench {

  /** JVM telemetry printed after each run: JIT code-cache occupancy, a
    * "compilation disabled" flag, loaded-class count, and cumulative GC
    * time. A full code cache (default reservation is 240 MiB) makes
    * HotSpot silently stop compiling — every later query then runs
    * partially interpreted and times 5-10x slower with byte-identical
    * code, which is indistinguishable from a plan regression unless
    * this is logged alongside the timing. */
  private def jvmStats(): String = {
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
    val ccUsed = pools.map(_.getUsage.getUsed).sum >> 20
    val ccMax = pools.map(p => math.max(p.getUsage.getMax, 0L)).sum >> 20
    val classes = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount
    val gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val heapMb = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    s"codecache=${ccUsed}M/${ccMax}M classes=$classes gc=${gcMs}ms heap=${heapMb}M"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // release per-query leftovers: operators persist intermediates, and
    // clearCache() misses localCheckpoint blocks (RDD storage, not the
    // SQL cache) — the iterative ops' results are checkpoint-backed.
    // BLOCKING unpersist: async removal would run concurrently with
    // (and distort) the next timed query. The per-operator
    // releaseCaches() calls also drain the CachePinning queues, so the
    // driver doesn't accumulate plan references across 46+ queries.
    def release(): Unit = {
      graft.operators.Dedup.releaseCaches(blocking = true)
      graft.operators.Similarity.releaseCaches(blocking = true)
      graft.operators.CorpusOps.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // sorted by name: Map iteration is hash-ordered, so adding a query
    // would otherwise reshuffle the whole run order between rounds and
    // make per-query times incomparable across BENCH_r{N}.json files
    // (any order-sensitive JVM effect — GC, code cache, page cache —
    // lands on different queries each round)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup: one sweep of EVERY query at a tiny SF before any timing.
    // A fresh JVM charges its first queries for JIT compilation of the
    // whole Spark stack + whole-stage-codegen classes (measured: 11s
    // for a 1.7s aggregate as the first query, ~2x on the next few) —
    // and since the run order is fixed, that bias would always land on
    // the same queries. The tiny-SF sweep compiles every plan shape at
    // negligible data cost; region.count() alone does not.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val tWarm = System.nanoTime()
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    release()
    System.err.println(
      f"[bench] warmup sweep ${(System.nanoTime() - tWarm) / 1e9}%.2f " +
        jvmStats())
    val results = ordered.map { case (name, fn) =>
      // min of N runs: steady-state throughput, insulated from one-off
      // JIT/GC/page-cache hiccups (OS cache of the parquet inputs stays
      // warm between runs; per-query state is released each time)
      val times = (1 to runsPerQuery).flatMap { i =>
        val t0 = System.nanoTime()
        // noop write, not count(): count() lets Catalyst prune every
        // unreferenced projection/window, so projection-heavy queries
        // would time as little more than a row-count scan. The noop
        // sink consumes each output row whole — all columns compute.
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        System.err.println(f"[bench] $name run$i $dt%.2f ${jvmStats()}")
        if (ok) Some(dt) else None
      }
      // -1 marks a failed query — a regression must not read as a speedup
      name -> (if (times.size == runsPerQuery) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
