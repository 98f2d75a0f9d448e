package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.JsonlSource

class JsonlSourceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def write(lines: String*): String = {
    val f = Files.createTempFile("graft_jsonl", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("reads declared-schema documents; malformed lines quarantine, not crash") {
    val path = write(
      """{"doc_id": 1, "text": "hello world"}""",
      """this is not json at all""",
      """{"doc_id": 2, "text": "second doc", "extra": "ignored"}""",
      """{"doc_id": 3""")
    val df = JsonlSource.read(spark, path, schema)
    val (good, bad) = JsonlSource.quarantine(df)
    assert(good.columns.toSeq == Seq("doc_id", "text"))
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "hello world"), (2L, "second doc")))
    assert(bad.as[String].collect().toSet ==
      Set("this is not json at all", """{"doc_id": 3"""))
  }

  test("schema containing the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, "/nonexistent",
        schema.add(JsonlSource.CorruptCol, StringType))
    }
  }

  test("ingestFace quarantines exactly the torn lines, keeps the rest") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val torn = docs.filter($"doc_id" % 37 === 5).count()
    val got = JsonlSource.ingestFace(spark, dir)
    val corrupt = got.filter($"lang" === "__corrupt__")
      .select("n_docs").as[Long].head()
    assert(corrupt == torn)
    val good = got.filter($"lang" =!= "__corrupt__")
      .agg(sum($"n_docs")).as[Long].head()
    assert(good == docs.count() - torn)
  }
}
