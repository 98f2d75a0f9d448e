package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHashExpr

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("scalar functions callable from SQL") {
    val r = spark.sql(
      "SELECT rolling_hash('hello world') AS rh, " +
      "  simhash(array(rolling_hash('a'), rolling_hash('b'))) AS sh, " +
      "  dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d, " +
      "  shingle_hashes('a b c d', 3) AS shs, " +
      "  minhash_sig(shingle_hashes('a b c d', 3)) AS sig, " +
      "  token_hashes('A b a') AS th, " +
      "  sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ints, " +
      "  top_ngram_count('a b a b a', 2) AS tn")
      .collect().head
    assert(r.getAs[Long]("rh") ==
      RollingHashExpr.hash("hello world", 31, 1000000007L))
    assert(r.getAs[Long]("d") == 4 + 10 + 18)
    assert(r.getSeq[Long](r.fieldIndex("shs")).length == 2) // "a b c", "b c d"
    assert(r.getSeq[Long](r.fieldIndex("sig")).length == 8)
    val th = r.getSeq[Long](r.fieldIndex("th"))
    assert(th.length == 3 && th(0) == th(2)) // lowercased, multiplicity kept
    assert(r.getAs[Int]("ints") == 2)
    assert(r.getAs[Long]("tn") == 2L) // "a b" x2, "b a" x2
  }

  test("top_k_by_sim aggregate callable from SQL") {
    Seq((1L, 0.9, 10L), (1L, 0.5, 11L), (1L, 0.7, 12L), (2L, 0.1, 13L))
      .toDF("g", "sim", "id").createOrReplaceTempView("sims")
    val rows = spark.sql(
      "SELECT g, top_k_by_sim(sim, id, 2) AS tk FROM sims GROUP BY g")
      .selectExpr("g", "tk.neighbor_id AS ids").as[(Long, Seq[Long])]
      .collect().toMap
    assert(rows(1L) == Seq(10L, 12L))
    assert(rows(2L) == Seq(13L))
  }

  test("wrong arity surfaces a clear error, not a MatchError") {
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_hash('a', 'b')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("expects 1 argument")),
      s"got: ${e.getMessage}")
  }

  test("SparkSessionExtensions route injects functions AND the interval-join rule") {
    import org.apache.spark.sql.SparkSession
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a NEW session over the shared SparkContext with the extension
    // class applied at build time. `spark.sql.extensions` is a STATIC
    // conf read from the SparkContext (created long before this test),
    // so the config-string route cannot be exercised in-JVM —
    // `withExtensions` invokes the exact same class the config route
    // instantiates. Never stop() s2: the context is shared.
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      assert(s2 ne spark, "builder reused the base session — the " +
        "extensions route was not exercised")
      // function injection, no register() call
      assert(s2.sql("SELECT rolling_hash('hello') AS h").count() == 1)
      // optimizer-rule injection is CONF-GATED on this route (r13
      // advice — the extension loads for every session, so the rewrite
      // must be an opt-in there): off by default, on with the flag
      import s2.implicits._
      def ts(x: String) = java.sql.Timestamp.valueOf(x)
      val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("lk", "lts")
      val r = Seq((2L, ts("2024-01-01 09:50:00"))).toDF("rk", "rts")
      def plan() = {
        val j = l.join(r, org.apache.spark.sql.functions.expr(
          "rts <= lts AND lts - rts < INTERVAL '20' MINUTE"))
        j.collect()
        j.queryExecution.executedPlan.toString
      }
      assert(!plan().contains("__graft_bin"),
        "gated rule fired without the opt-in flag")
      s2.conf.set(graft.plans.BinIntervalJoinsGated.EnabledKey, "true")
      try assert(plan().contains("__graft_bin"),
        "injectOptimizerRule route did not fire with the flag set")
      finally s2.conf.unset(graft.plans.BinIntervalJoinsGated.EnabledKey)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL results match the Column API on real documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(shingle_hashes(text, 3)) AS sig FROM docs")
      .as[(Long, Seq[Long])].collect().toMap
    val viaApi = d.select($"doc_id",
        graft.operators.Dedup.minhashSignature($"text", 3).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql == viaApi)
  }
}
