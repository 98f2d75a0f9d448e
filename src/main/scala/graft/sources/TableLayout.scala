package graft.sources

import org.apache.spark.sql.DataFrame

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

  /** Rewrite a FLAT parquet directory into ~`targetBytes`-sized files —
    * the small-file compaction every long-running ingest needs (a 100 TB
    * table accreting 1000 micro-batches/day of KB-sized files destroys
    * scan parallelism bookkeeping and NameNode/listing time; compacting
    * to ~128 MB restores one-task-per-file scans). Coalesce (not
    * repartition): no shuffle — existing partitions are concatenated.
    *
    * Hive-partitioned directories are REJECTED (compacting them flat
    * would silently destroy directory pruning — compact each leaf
    * directory instead). Schemas that evolved across files are unioned
    * (`mergeSchema`), so no column is dropped by footer sampling.
    *
    * Durability: parquet directories are not transactional — the final
    * source overwrite has a crash window, during which the full
    * compacted copy survives at `<path>__compact_tmp` for manual
    * recovery. Use a table format with atomic commit where that window
    * is unacceptable. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // streaming file-sink output is owned by its _spark_metadata commit
    // log: log-aware readers trust the log, not the directory listing,
    // and a restarted query rebuilds the log from its checkpoint — an
    // overwrite here would desync both and silently lose every
    // pre-compaction file from log-aware reads. Checked BEFORE the
    // read: the read itself would already go through the log.
    require(!fs.exists(new org.apache.hadoop.fs.Path(hadoopPath, "_spark_metadata")),
      s"$path is a streaming file-sink output (_spark_metadata present); " +
        "compacting would desync the sink's commit log — stop the query " +
        "and rewrite to a NEW path instead")
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    require(!df.inputFiles.exists(f =>
        new org.apache.hadoop.fs.Path(new java.net.URI(f))
          .getParent.getName.contains("=")),
      s"$path is hive-partitioned; compact each leaf directory instead " +
        "(a flat rewrite would silently drop the partition layout)")
    // size by ACTUAL on-disk bytes via one recursive listing, not
    // optimizer stats (decompressed width, oversplits) and not
    // per-file getFileStatus RPCs (serial driver round-trips)
    val totalBytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.coalesce(nFiles).write.mode("overwrite").parquet(tmp)
    // swap: overwrite source from the materialized compacted copy
    // (reading tmp, not the original lineage, makes the overwrite
    // safe); re-coalesce — the tmp scan re-splits by maxPartitionBytes,
    // which would otherwise silently cap output files at ~128 MB
    spark.read.parquet(tmp).coalesce(nFiles)
      .write.mode("overwrite").parquet(path)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Read a parquet directory written under an EVOLVING schema: file
    * footers are reconciled into the union schema (columns absent in
    * older files surface as null) — append-only column evolution, the
    * standard contract for long-lived corpus tables. */
  def readMergedSchema(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

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
