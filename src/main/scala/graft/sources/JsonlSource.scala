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
}
