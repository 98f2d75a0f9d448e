package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON reader — the lingua franca of training-data
  * corpus interchange (one document object per line).
  *
  * Spark-first: `spark.read.json` with an EXPLICIT schema. Schema
  * inference costs a full extra pass over the data (fatal at 100 TB)
  * and silently widens types from whatever happens to be in the
  * sample; a declared schema makes the scan single-pass, splittable
  * (plain-text JSONL splits on line boundaries; gzip members don't),
  * and stable across corpus versions.
  *
  * Malformed lines must never kill a petabyte ingest: PERMISSIVE mode
  * routes them into a `_corrupt` column (null for good rows) so the
  * pipeline can count/quarantine them instead of crashing.
  *
  * (Beyond-reference capability: the reference's only source is the
  * whitespace edge-list text format, `Graph.py:4-8`.)
  */
object JsonlSource {

  /** Column that carries the raw text of unparseable lines. */
  val CorruptCol = "_corrupt"

  /** Read `path` (file, directory, or glob of .jsonl) under `schema`.
    * Returned frame has `schema`'s columns plus [[CorruptCol]]
    * (string, null for well-formed rows).
    *
    * Note Spark's standing restriction: a query that selects ONLY the
    * corrupt column (e.g. `df.filter($"_corrupt".isNotNull).count()`)
    * must select at least one data column too (or cache first) —
    * otherwise the scan may skip parsing and return no corrupt rows. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Split a frame read by [[read]] into (good rows without the
    * corrupt column, quarantined raw lines) — the standard
    * ingest-with-quarantine step.
    *
    * Persists the parsed frame: Spark rejects plans that reference
    * ONLY the corrupt column of a JSON scan (the parser could skip
    * parsing entirely), and the split consumes the parse twice anyway.
    * Caller unpersists when both sides are materialized. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.persist()
    val good = cached.filter(cached.col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(cached.col(CorruptCol).isNotNull)
      .select(cached.col(CorruptCol).as("raw_line"))
    (good, bad)
  }

  /** Gate face: the ingest-with-quarantine path end-to-end on REAL
    * files. Documents are serialized to JSONL with a deterministic
    * corruption overlay (every doc_id % 37 == 5 line is truncated
    * mid-object — the torn-write/partial-upload shape), read back
    * under the explicit schema in PERMISSIVE mode, split into
    * good/quarantined, and aggregated per language plus one
    * `__corrupt__` audit row. A malformed line must never kill the
    * ingest NOR silently vanish — the hash gate pins both counts. */
  def ingestFace(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = TableLayout.freshTmp("graft_jsonl_")
    val path = tmp.resolve("docs").toString
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
      docs.select(
          when(col("doc_id") % 37 === 5,
            concat(lit("{\"doc_id\":"), col("doc_id"),
              lit(",\"lang\":\""), col("lang")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"),
            col("source"), col("n_chars"))))
          .as("value"))
        .write.mode("overwrite").text(path)
      val schema = new StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("lang", StringType)
        .add("source", StringType)
        .add("n_chars", org.apache.spark.sql.types.LongType)
      val parsed = read(spark, path, schema)
      val (good, bad) = quarantine(parsed)
      try {
        good.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_sum"))
          .unionByName(bad.agg(count(lit(1)).as("n_docs"))
            .select(lit("__corrupt__").as("lang"), col("n_docs"),
              lit(null).cast("long").as("chars_sum")))
          .orderBy("lang")
          .localCheckpoint(true)
      } finally parsed.unpersist() // quarantine()'s pin, both sides read
    } finally TableLayout.rmTree(tmp)
  }
}
