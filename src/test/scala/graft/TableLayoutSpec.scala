package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.TableLayout

class TableLayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def collectPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan
  }

  test("partitioned parquet write prunes directories on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    TableLayout.writePartitioned(docs, dir, Seq("lang"))

    val back = spark.read.parquet(dir).filter($"lang" === "en")
    val plan = collectPlan(back)
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // pruning reached the scan: the partition filter is on the scan
    // node and only the lang=en directory's files are read
    assert(scans.head.partitionFilters.nonEmpty)
    val totalLangs = docs.select(countDistinct($"lang")).as[Long].head()
    assert(totalLangs > 1)
    // strictly fewer files read than exist across all lang= directories
    val allFiles = spark.read.parquet(dir).inputFiles.length
    assert(scans.head.metrics("numFiles").value < allFiles)
    // values intact
    assert(back.count() == docs.filter($"lang" === "en").count())
  }

  test("compact rewrites a fragmented directory into few files, data intact") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(64).write.parquet(dir) // simulate micro-batch fragmentation
    assert(spark.read.parquet(dir).inputFiles.length >= 32)
    val before = docs.orderBy("doc_id").collect()
    graft.sources.TableLayout.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length <= 4)
    assert(after.orderBy("doc_id").collect().toSeq == before.toSeq)
  }

  test("compact refuses streaming file-sink output (_spark_metadata)") {
    val dir = Files.createTempDirectory("graft_sinkdir").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    // a file sink's commit log marks the directory as log-owned
    Files.createDirectory(java.nio.file.Paths.get(dir, "_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.TableLayout.compact(spark, dir)
    }
    assert(e.getMessage.contains("_spark_metadata"))
    // and nothing was rewritten (the refusal pre-empts even the read,
    // which would itself be routed through the commit log)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".parquet")))
  }

  test("readMergedSchema unions evolving file schemas; old files null-fill") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir + "/batch=1")
    Seq((2L, "b", 9L)).toDF("id", "v1", "v2").write.parquet(dir + "/batch=2")
    val got = graft.sources.TableLayout.readMergedSchema(spark, dir)
      .select($"id", $"v1", $"v2").orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(9L))))
  }

  test("bucketed tables equi-join with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      TableLayout.writeBucketed(o, "b_orders", "o_orderkey", 8)
      TableLayout.writeBucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = collectPlan(joined)
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the join reads co-located buckets: a sort-merge join with NO
      // shuffle anywhere beneath it (the aggregation above may still
      // exchange its few grouped rows). AQE wraps finished stages in
      // QueryStageExec leaves, so flatten through them explicitly.
      def all(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(all)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            all(q.plan)
          case _ => Nil
        })
      val smjs = all(inner).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join, plan:\n$inner")
      assert(smjs.forall(j => all(j).collect {
        case e: ShuffleExchangeExec => e }.isEmpty),
        s"bucketed join shuffled its inputs, plan:\n$inner")
      // join result matches the unbucketed plan
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val got = joined.as[(String, Long)].collect().toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  // ---- gate faces: each runs end-to-end (its physical require()s
  // fire inside) and the logical result is cross-checked against the
  // plain unbucketed/unpartitioned computation ----

  private val faceDir = "/root/testdata/sf0.001"

  test("bucketedJoinFace matches the plain join rollup") {
    val got = TableLayout.bucketedJoinFace(spark, faceDir)
    assert(got.columns.toSeq ==
      Seq("c_mktsegment", "n_customers", "n_orders", "revenue"))
    val o = spark.read.parquet(s"$faceDir/orders.parquet")
    val c = spark.read.parquet(s"$faceDir/customer.parquet")
    val expected = o.join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(countDistinct($"c_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("c_mktsegment")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.as[(String, Long, Long, Double)].collect().toSeq == expected)
  }

  test("partitionPrunedFace matches the unpartitioned filtered aggregate") {
    val got = TableLayout.partitionPrunedFace(spark, faceDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expected = spark.read.parquet(s"$faceDir/events.parquet")
      .filter($"event_type" === "purchase")
      .groupBy(date_format($"ts", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))
      .orderBy("month")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("sortedLayoutFace matches the plain aggregate (disjointness enforced inside)") {
    val docs = spark.read.parquet(s"$faceDir/documents.parquet")
    val got = TableLayout.sortedLayoutFace(spark, faceDir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val minChars = docs.agg(min($"n_chars")).as[Long].head()
    val expected = (docs.count(),
      minChars,
      docs.agg(max($"n_chars")).as[Long].head(),
      docs.agg(sum($"n_chars")).as[Long].head(),
      docs.select(countDistinct($"lang")).as[Long].head(),
      docs.filter($"n_chars" === minChars).count())
    assert(got == expected)
  }

  test("writeSorted produces disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("graft_sortw").toString + "/t"
    val docs = spark.read.parquet(s"$faceDir/documents.parquet")
      .select($"doc_id", $"n_chars")
    TableLayout.writeSorted(docs, dir, "n_chars", 4)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(perFile.length == 4)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2,
        s"overlapping ranges: ${a._2}..${a._3} vs ${b._2}..${b._3}")
      case _ => ()
    }
    // nothing lost by the range exchange + sort
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("zValue interleaves normalized bits (Morton order)") {
    // 2-point sanity: (min,min) -> 0; (max,max) -> all 32 bits set
    val df = Seq((0L, 0L), (100L, 200L), (100L, 0L), (0L, 200L))
      .toDF("x", "y")
    val z = df.select(TableLayout.zValue(
        $"x", 0L, 100L, $"y", 0L, 200L).as("z"))
      .as[Long].collect().toSeq
    assert(z(0) == 0L)
    assert(z(1) == 0xFFFFFFFFL)
    // x-only max sets exactly the even bits, y-only max the odd bits
    assert(z(2) == 0x55555555L)
    assert(z(3) == 0xAAAAAAAAL)
    // locality: reference Morton of the scalar ranks matches
    def morton(xq: Long, yq: Long): Long =
      (0 until 16).map(k =>
        ((xq >> k & 1L) << (2 * k)) | ((yq >> k & 1L) << (2 * k + 1))).sum
    val rnd = Seq((17L, 33L), (64L, 199L), (99L, 1L))
    val got = rnd.toDF("x", "y").select(TableLayout.zValue(
        $"x", 0L, 100L, $"y", 0L, 200L).as("z"))
      .as[Long].collect().toSeq
    val expected = rnd.map { case (x, y) =>
      morton(x * 65535L / 100L, y * 65535L / 200L)
    }
    assert(got == expected)
  }

  test("orcRoundTripFace preserves content and pushes the predicate " +
      "(enforced inside); equals the parquet-side aggregate") {
    val got = TableLayout.orcRoundTripFace(spark, faceDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val expected = spark.read.parquet(s"$faceDir/documents.parquet")
      .where($"n_chars" > 500)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("cs"),
        countDistinct($"source").as("ns"),
        min($"doc_id").as("mn"), max($"doc_id").as("mx"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("zValueN: 3 dimensions interleave round-robin; huge ranges " +
      "(the old Long-overflow regime) stay exact and monotone") {
    // corner points: all-min -> 0; all-max -> all 48 bits set
    val df3 = Seq((0L, 0L, 0L), (10L, 20L, 30L)).toDF("x", "y", "z")
    val z3 = df3.select(TableLayout.zValueN(Seq(
        ($"x", 0L, 10L), ($"y", 0L, 20L), ($"z", 0L, 30L))).as("v"))
      .as[Long].collect().toSeq
    assert(z3(0) == 0L)
    assert(z3(1) == (1L << 48) - 1)
    // single-dimension max sets exactly every 3rd bit at its offset
    val solo = Seq((10L, 0L, 0L), (0L, 20L, 0L), (0L, 0L, 30L))
      .toDF("x", "y", "z")
      .select(TableLayout.zValueN(Seq(
        ($"x", 0L, 10L), ($"y", 0L, 20L), ($"z", 0L, 30L))).as("v"))
      .as[Long].collect().toSeq
    val evry3 = (0 until 16).map(k => 1L << (3 * k)).sum
    assert(solo == Seq(evry3, evry3 << 1, evry3 << 2))
    // the r13-advice regime: range >> 2^53/65535, where the old
    // (v-lo)*65535 product overflowed Long and produced garbage. The
    // shift path must stay monotone and 16-bit-bounded.
    val lo = -4611686018427387904L // -2^62
    val hi = 4611686018427387903L  // 2^62 - 1
    val xs = Seq(lo, lo / 2, -1L, 0L, 1L, hi / 2, hi)
    val ranks = xs.toDF("x")
      .select(TableLayout.zValueN(Seq(($"x", lo, hi), (lit(0L), 0L, 1L)))
        .as("v"))
      .as[Long].collect().toSeq
    // y contributes 0, so v is the x rank spread over even bits —
    // recover the rank by de-interleaving
    def unEven(v: Long): Long =
      (0 until 16).map(k => ((v >> (2 * k)) & 1L) << k).sum
    val rs = ranks.map(unEven)
    assert(rs == rs.sorted, s"ranks not monotone: $rs")
    assert(rs.forall(r => r >= 0L && r <= 65535L), s"rank out of range: $rs")
    assert(rs.head == 0L)
    assert(rs.last >= 32768L, s"top of range maps too low: ${rs.last}")
  }

  test("zValueN: a range whose WIDTH overflows Long (r14 advice — " +
      "[MinValue, MaxValue]) ranks monotone via the unsigned borrow path") {
    val lo = Long.MinValue
    val hi = Long.MaxValue
    // straddle the sign boundary and both extremes
    val xs = Seq(lo, lo + 1, lo / 2, -(1L << 50), -1L, 0L, 1L,
      1L << 50, hi / 2, hi - 1, hi)
    val ranks = xs.toDF("x")
      .select(TableLayout.zValueN(Seq(($"x", lo, hi), (lit(0L), 0L, 1L)))
        .as("v"))
      .as[Long].collect().toSeq
    def unEven(v: Long): Long =
      (0 until 16).map(k => ((v >> (2 * k)) & 1L) << k).sum
    val rs = ranks.map(unEven)
    assert(rs == rs.sorted, s"ranks not monotone: $rs")
    assert(rs.forall(r => r >= 0L && r <= 65535L), s"rank out of range: $rs")
    assert(rs.head == 0L, s"lo must rank 0: ${rs.head}")
    assert(rs.last == 65535L, s"hi must rank 2^16-1: ${rs.last}")
    // the sign boundary sits at mid-range: -1 -> 32767, 0 -> 32768
    assert(rs(xs.indexOf(-1L)) == 32767L && rs(xs.indexOf(0L)) == 32768L,
      s"sign boundary mis-ranked: $rs")
  }

  test("zorder3LayoutFace matches the plain aggregate (span contracts inside)") {
    val got = TableLayout.zorder3LayoutFace(spark, faceDir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val ev = spark.read.parquet(s"$faceDir/events.parquet")
      .withColumn("vc", floor($"value" * 100 + 0.5).cast("long"))
    val expected = (ev.count(),
      ev.select(countDistinct($"user_id")).as[Long].head(),
      ev.select(countDistinct($"vc")).as[Long].head(),
      ev.agg(min($"event_id")).as[Long].head(),
      ev.agg(max($"event_id")).as[Long].head(),
      ev.agg(sum($"vc")).as[Long].head())
    assert(got == expected)
  }

  test("zorderLayoutFace matches the plain aggregate (span contracts inside)") {
    val got = TableLayout.zorderLayoutFace(spark, faceDir)
      .as[(Long, Long, Long, Long, Long)].head()
    val ev = spark.read.parquet(s"$faceDir/events.parquet")
    val expected = (ev.count(),
      ev.select(countDistinct($"user_id")).as[Long].head(),
      ev.agg(min($"event_id")).as[Long].head(),
      ev.agg(max($"event_id")).as[Long].head(),
      ev.agg(sum($"user_id")).as[Long].head())
    assert(got == expected)
  }

  test("compactionFace and schemaEvolutionFace conserve every document") {
    val nDocs = spark.read.parquet(s"$faceDir/documents.parquet").count()
    val cf = TableLayout.compactionFace(spark, faceDir)
    assert(cf.agg(sum($"n_docs")).as[Long].head() == nDocs)
    val se = TableLayout.schemaEvolutionFace(spark, faceDir)
    assert(se.agg(sum($"n_total")).as[Long].head() == nDocs)
    // evolved rows are exactly the odd doc_ids
    val oddDocs = spark.read.parquet(s"$faceDir/documents.parquet")
      .filter($"doc_id" % 2 === 1).count()
    assert(se.agg(sum($"n_evolved")).as[Long].head() == oddDocs)
  }

  test("manifest commit: orphans invisible, staging invisible until " +
      "the pointer flip, pinned manifests time-travel") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest-spec-")
    val table = tmp.resolve("t").toString
    try {
      val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      TableLayout.writeManifested(v1, table, 1L)
      // a crashed writer's orphan lands INSIDE the live data dir — a
      // directory-scoped reader would read it as data
      Seq((99L, "orphan")).toDF("id", "v").write.mode("append")
        .parquet(java.nio.file.Paths.get(table, "data", "v1").toString)
      assert(TableLayout.readManifested(spark, table)
        .as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")),
        "orphan leaked into the manifested read")
      // v2 fully staged WITHOUT a pointer flip: data + manifest
      val v2 = Seq((1L, "a2"), (4L, "d")).toDF("id", "v")
      val v2Dir = java.nio.file.Paths.get(table, "data", "v2")
      v2.write.parquet(v2Dir.toString)
      val files = new java.io.File(v2Dir.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(table, "_manifests", "v2.list"),
        files.mkString("\n").getBytes("UTF-8"))
      assert(TableLayout.readManifested(spark, table)
        .as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")),
        "staged v2 visible before the pointer flip")
      // the flip (writeManifested would restage; flip the pointer raw)
      val ptr = java.nio.file.Paths.get(table, "_current.tmpX")
      java.nio.file.Files.write(ptr, "v2".getBytes("UTF-8"))
      java.nio.file.Files.move(ptr,
        java.nio.file.Paths.get(table, "_current"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      assert(TableLayout.readManifested(spark, table)
        .as[(Long, String)].collect().toSet == Set((1L, "a2"), (4L, "d")))
      // pinned historical manifest still reads v1 (and still excludes
      // the orphan sitting in its directory)
      assert(TableLayout.readManifestVersion(spark, table, "v1")
        .as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
  }

  test("manifest vacuum reclaims expired snapshots and orphans, keeps " +
      "the current read bit-stable, refuses to expire the current") {
    val tmp = java.nio.file.Files.createTempDirectory("vacuum-spec-")
    val table = tmp.resolve("t").toString
    try {
      TableLayout.writeManifested(
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), table, 1L)
      // orphan: staged into v1's dir, referenced by no manifest
      Seq((99L, "orphan")).toDF("id", "v").write.mode("append")
        .parquet(java.nio.file.Paths.get(table, "data", "v1").toString)
      TableLayout.writeManifested(
        Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), table, 2L)
      // refusing to expire the current snapshot
      intercept[IllegalArgumentException] {
        TableLayout.vacuumManifested(table, retainFrom = 3L)
      }
      def dataFiles(): Long = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(
            java.nio.file.Paths.get(table, "data"))
          .iterator().asScala
          .count(java.nio.file.Files.isRegularFile(_)).toLong
      }
      val before = dataFiles()
      val (deleted, expired) = TableLayout.vacuumManifested(table, 2L)
      assert(expired == 1)
      assert(deleted >= 2, s"v1's file(s) + the orphan, got $deleted")
      assert(dataFiles() == before - deleted)
      // current read bit-stable across the vacuum
      assert(TableLayout.readManifested(spark, table)
        .as[(Long, String)].collect().toSet == Set((1L, "a2"), (3L, "c")))
      // sub-horizon time travel fails loudly (manifest gone), never
      // silently reads a half-deleted snapshot
      intercept[Exception] {
        TableLayout.readManifestVersion(spark, table, "v1").collect()
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
  }
}
