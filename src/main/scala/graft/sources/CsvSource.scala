package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** CSV reader with declared schema and corrupt-line quarantine — the
  * other interchange format a corpus ingest actually meets (exports
  * from spreadsheets/warehouses arrive as CSV, not JSONL).
  *
  * Same design rules as [[JsonlSource]]: an EXPLICIT schema (inference
  * is a full extra pass and samples its way to unstable types — fatal
  * at 100 TB), single-pass splittable plain text, and PERMISSIVE mode
  * routing malformed rows — wrong token count, unparseable field —
  * into a corrupt column instead of killing the ingest.
  *
  * (Beyond-reference capability: the reference's only source is the
  * whitespace edge-list text format, `Graph.py:4-8`; its only CSV
  * surface is the metrics APPEND sink, `BFS_map_reduce.py:154-164` —
  * this is the read side a user migrating that sink's output needs.)
  */
object CsvSource {

  /** Column that carries the raw text of unparseable lines — same
    * name as [[JsonlSource.CorruptCol]], so the shared
    * [[JsonlSource.quarantine]] split applies to both formats. */
  val CorruptCol: String = JsonlSource.CorruptCol

  /** Read `path` (file, directory, or glob of headerless .csv) under
    * `schema`. Returned frame has `schema`'s columns plus
    * [[CorruptCol]] (string, null for well-formed rows). The same
    * corrupt-column restriction as JSON applies: a plan selecting
    * ONLY the corrupt column may skip parsing — keep a data column in
    * scope or go through [[JsonlSource.quarantine]] (which pins). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Gate face: CSV ingest-with-quarantine end-to-end on REAL files.
    * Documents serialize to comma-free-field CSV with a deterministic
    * corruption overlay (every doc_id % 41 == 7 line truncated after
    * its first field and one character of the second — the torn-write
    * shape, guaranteed malformed by token count), read back under the
    * declared schema, split good/quarantined via the shared
    * [[JsonlSource.quarantine]], and aggregated per language plus the
    * `__corrupt__` audit row. The hash gate pins BOTH counts —
    * malformed lines neither kill the ingest nor silently vanish. */
  def ingestFace(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = TableLayout.freshTmp("graft_csv_")
    val path = tmp.resolve("docs").toString
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
      // fields are comma-free by construction (ids, lang codes, source
      // labels, counts), so plain concat_ws IS valid CSV — no quoting
      docs.select(
          when(col("doc_id") % 41 === 7,
            concat(col("doc_id"), lit(","), substring(col("lang"), 1, 1)))
          .otherwise(concat_ws(",", col("doc_id"), col("lang"),
            col("source"), col("n_chars")))
          .as("value"))
        .write.mode("overwrite").text(path)
      val schema = new StructType()
        .add("doc_id", LongType)
        .add("lang", StringType)
        .add("source", StringType)
        .add("n_chars", LongType)
      val parsed = read(spark, path, schema)
      val (good, bad) = JsonlSource.quarantine(parsed)
      try {
        good.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_sum"))
          .unionByName(bad.agg(count(lit(1)).as("n_docs"))
            .select(lit("__corrupt__").as("lang"), col("n_docs"),
              lit(null).cast("long").as("chars_sum")))
          .orderBy("lang")
          .localCheckpoint(true)
      } finally parsed.unpersist()
    } finally TableLayout.rmTree(tmp)
  }
}
