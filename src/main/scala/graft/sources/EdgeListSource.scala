package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's edge-list text format
  * (`Graph.py:4-8` in Riachi02/BFS-MapReduce; Presentazione.pdf slide
  * 24): one undirected edge per line, whitespace-separated integer
  * vertex ids, e.g. `"0 5"`.
  *
  * Spark-first: `spark.read.text` (splittable, distributed scan) + a
  * codegen'd split/cast projection — no driver-side parsing. Blank and
  * malformed lines are dropped rather than crashing the scan, so a
  * 100 TB ingest doesn't die on one bad record.
  */
object EdgeListSource {

  /** @return DataFrame(src LONG, dst LONG) — directed as written; apply
    *         `GraphOps.symmetrize` for the reference's undirected
    *         semantics. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        // try_cast: malformed lines yield null (dropped below) instead
        // of failing the whole scan under ANSI mode.
        element_at(toks, 1).try_cast("long").as("src"),
        try_element_at(toks, lit(2)).try_cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
  }
}
