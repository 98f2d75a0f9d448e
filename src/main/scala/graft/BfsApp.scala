package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Bfs, GraphOps, MetricsSink}
import graft.sources.EdgeListSource

/** The reference's flagship CLI, reproduced end-to-end
  * (`python BFS_map_reduce.py -p <dataset> -w <workers>` —
  * `BFS_map_reduce.py:95-166` in Riachi02/BFS-MapReduce): read a
  * whitespace edge-list text file, run single-source BFS from vertex 0
  * (the reference hardcodes source 0; `-s` overrides here), report
  * per-vertex distance/path/color for ALL vertices (unreachable ones
  * surface as WHITE with null dist — reference hazard H4 fixed), and
  * append a `(Dataset, n_Workers, Tempo)` row to `results.csv` exactly
  * like the reference's metrics sink.
  *
  * Usage:
  *   runMain graft.BfsApp -p <edge-list path> [-w <workers>]
  *     [-s <source>] [-o <output parquet dir>] [-r <results.csv path>]
  *
  * Timing covers the whole run including ingest, matching the
  * reference's `Tempo` definition (`BFS_map_reduce.py:101,152`).
  */
object BfsApp {

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val aliases = Map("-p" -> "path", "--path" -> "path",
      "-w" -> "workers", "--workers" -> "workers",
      "-s" -> "source", "--source" -> "source",
      "-o" -> "output", "--output" -> "output",
      "-r" -> "results", "--results" -> "results")
    args.sliding(2, 2).collect {
      case Array(k, v) if aliases.contains(k) => aliases(k) -> v
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val path = opts.getOrElse("path",
      sys.error("usage: BfsApp -p <edge-list path> [-w workers] [-s source]"))
    val workers = opts.get("workers").map(_.toInt).getOrElse(4)
    val source = opts.get("source").map(_.toLong).getOrElse(0L)
    val results = opts.getOrElse("results", "results.csv")
    require(workers > 0, s"workers must be positive, got $workers")

    val spark = SparkSession.builder()
      .master(s"local[$workers]")
      .appName("graft-bfs")
      .config("spark.sql.shuffle.partitions", workers)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val edges = GraphOps.symmetrize(EdgeListSource.load(spark, path))
    val reached = Bfs.run(edges, source, Bfs.Config(withPaths = true))
    val full = Bfs.withUnreachable(reached, edges)
    val out = opts.get("output") match {
      case Some(dir) =>
        full.write.mode("overwrite").parquet(dir)
        full.count()
      case None => full.count()
    }
    val seconds = (System.nanoTime() - t0) / 1e9

    MetricsSink.append(results, path, workers, seconds)
    println(f"$out vertices, source $source, $seconds%.2f s " +
      s"(metrics appended to $results)")
    spark.stop()
  }
}
