package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** Physical table layout for scale: hive-style partitioned parquet
  * directories (reads prune whole directories via `PartitionFilters`)
  * and bucketed tables (co-located equi-joins/aggregations with NO
  * exchange — the "pre-shuffled once, joined many times" pattern that
  * pays for itself the second time a 100 TB fact table is joined on
  * its bucket key).
  *
  * Beyond-reference capability: the reference's only sink is a CSV
  * metrics append (`BFS_map_reduce.py:154-164`); a real corpus
  * pipeline needs layout-aware parquet output.
  */
object TableLayout {

  /** Write `df` as parquet partitioned by `partCols` (low-cardinality
    * columns only — each distinct combination becomes a directory).
    * Readers filtering on `partCols` scan only matching directories. */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Register `df` as a parquet-backed table bucketed (and sorted)
    * by `bucketCol` into `numBuckets` files per partition. Equi-joins
    * and aggregations on `bucketCol` between tables with matching
    * bucketing read co-located buckets directly — no shuffle, and with
    * `sortBy` no re-sort for sort-merge joins. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
