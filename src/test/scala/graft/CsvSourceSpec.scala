package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{CsvSource, JsonlSource}

class CsvSourceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def write(lines: String*): String = {
    val f = Files.createTempFile("graft_csv", ".csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("reads declared-schema rows; wrong token count and bad types " +
      "quarantine, not crash") {
    val path = write(
      "1,hello",
      "2,second",
      "3",            // too few tokens
      "4,extra,field", // too many tokens
      "notanumber,text") // type failure in a long column
    val df = CsvSource.read(spark, path, schema)
    val (good, bad) = JsonlSource.quarantine(df)
    assert(good.columns.toSeq == Seq("doc_id", "text"))
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "hello"), (2L, "second")))
    assert(bad.as[String].collect().toSet ==
      Set("3", "4,extra,field", "notanumber,text"))
  }

  test("schema containing the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, "/nonexistent",
        schema.add(CsvSource.CorruptCol, StringType))
    }
  }

  test("ingestFace quarantines exactly the torn lines, keeps the rest") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val torn = docs.filter($"doc_id" % 41 === 7).count()
    val got = CsvSource.ingestFace(spark, dir)
    val corrupt = got.filter($"lang" === "__corrupt__")
      .select("n_docs").as[Long].head()
    assert(corrupt == torn)
    val good = got.filter($"lang" =!= "__corrupt__")
      .agg(sum($"n_docs")).as[Long].head()
    assert(good == docs.count() - torn)
  }
}
