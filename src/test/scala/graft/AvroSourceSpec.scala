package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.AvroSource

class AvroSourceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
      .foreach(x => java.nio.file.Files.deleteIfExists(x))
  }

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "lang", "source", "n_chars")

  test("stage + read round-trip resolves BOTH writer schemas under " +
      "one reader: v1 rows get the alias rename and the quality " +
      "default; v2 rows carry real quality") {
    val tmp = java.nio.file.Files.createTempDirectory("avro-spec-")
    try {
      // slices: 0..3 -> v1 writer; 4, 6, 7 -> v2; 5 -> torn (intact here)
      val in = docs((0L, "en", "web", 100L), (3L, "de", "book", 300L),
        (4L, "fr", "news", 4000L), (5L, "es", "web", 500L),
        (7L, "en", "code", 700L))
      AvroSource.stageAvro(in, tmp.toString)
      val got = AvroSource.readAvro(spark, tmp.toString)
        .filter(col("corrupt_path").isNull)
        .select("doc_id", "lang", "source_name", "quality")
        .as[(Long, String, String, Double)].collect().toSeq.sortBy(_._1)
      assert(got == Seq(
        (0L, "en", "web", -1.0),   // v1: default quality, aliased rename
        (3L, "de", "book", -1.0),
        (4L, "fr", "news", 4.0),   // v2: real quality = n_chars/1000
        (5L, "es", "web", 0.5),    // torn slice intact -> still reads
        (7L, "en", "code", 0.7)))
    } finally rmTree(tmp)
  }

  test("a container file with broken magic quarantines WHOLE — one " +
      "sentinel row with the path, no partial rows leak") {
    val tmp = java.nio.file.Files.createTempDirectory("avro-spec-")
    try {
      AvroSource.stageAvro(
        docs((1L, "en", "web", 100L), (5L, "es", "web", 500L)),
        tmp.toString)
      val torn = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith("-torn.avro"))
      assert(torn.length == 1)
      val raw = java.nio.file.Files.readAllBytes(torn.head.toPath)
      raw(0) = 'X'.toByte
      java.nio.file.Files.write(torn.head.toPath, raw)
      // delete the Hadoop CRC sidecar the raw overwrite invalidated —
      // the spec tests AVRO-level rejection, not FS checksums
      val crc = new java.io.File(torn.head.getParentFile,
        "." + torn.head.getName + ".crc")
      if (crc.exists()) crc.delete()
      val rows = AvroSource.readAvro(spark, tmp.toString).collect().toSeq
      val (bad, good) = rows.partition(_.corrupt_path != null)
      assert(bad.map(_.corrupt_path).forall(_.endsWith("-torn.avro")))
      assert(bad.size == 1, s"expected one quarantine sentinel: $bad")
      assert(good.map(_.doc_id).sorted == Seq(1L),
        "only the intact file's rows may survive")
    } finally rmTree(tmp)
  }

  test("a torn TAIL (truncated mid-block) also quarantines the file " +
      "wholesale — no partial rows flow before the checksum fails") {
    val tmp = java.nio.file.Files.createTempDirectory("avro-spec-")
    try {
      // many v2 rows in one file so truncation lands mid-block
      AvroSource.stageAvro(
        docs((0 until 64).map(i =>
          (i * 8L + 4L, "en", "web", 100L + i)): _*),
        tmp.toString)
      val v2 = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith("-v2.avro"))
      assert(v2.nonEmpty)
      v2.foreach { f =>
        val raw = java.nio.file.Files.readAllBytes(f.toPath)
        java.nio.file.Files.write(f.toPath, raw.take(raw.length / 2))
        val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
        if (crc.exists()) crc.delete()
      }
      val rows = AvroSource.readAvro(spark, tmp.toString).collect().toSeq
      assert(rows.count(_.corrupt_path != null) == v2.length,
        s"every truncated file must quarantine: $rows")
      assert(rows.filter(_.corrupt_path == null).isEmpty ||
        rows.filter(_.corrupt_path == null).forall(_.doc_id % 8 != 4),
        "no rows from the truncated v2 files may leak")
    } finally rmTree(tmp)
  }
}
