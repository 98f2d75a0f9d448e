package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TopNgramCountExpr
import graft.operators.{CorpusOps, Dedup}

/** Semantics of the CorpusOps operators that the driver oracle can't
  * fully exercise (the native top-ngram expression's edge cases) plus
  * the CachePinning release contract the Bench/Verify harnesses rely
  * on. */
class CorpusOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def topBigram(s: String): Long =
    TopNgramCountExpr.compute(UTF8String.fromString(s), 2)

  test("top_ngram_count: multiplicity of the most frequent bigram") {
    // "a b" x2, "b a" x2 -> 2
    assert(topBigram("a b a b a") == 2L)
    // "x x" x3
    assert(topBigram("x x x x") == 3L)
    // all bigrams distinct -> 1
    assert(topBigram("one two three four") == 1L)
    // case-insensitive (lowercased before hashing)
    assert(topBigram("A b a B a") == 2L)
    // fewer than n tokens: no complete n-gram
    assert(topBigram("solo") == 0L)
    assert(topBigram("") == 0L)
    // trigram mode
    assert(TopNgramCountExpr.compute(
      UTF8String.fromString("a b c a b c a b c"), 3) == 3L)
  }

  test("repetitionStats: per-row values, zero-shuffle formulation") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam"),   // 3 bigrams, all "spam spam"
      (2L, "the quick brown fox"),   // 3 distinct bigrams
      (3L, "solo"),                  // <2 tokens: omitted
      (4L, "a b a b")                // "a b" x2, "b a" x1
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_distinct_tokens", "n_bigrams",
        "top_bigram_n", "repetitive")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 3L, 3L, true),    // top frac 1.0 > 0.12
      (2L, 4L, 4L, 3L, 1L, true),    // 1/3 = 0.33 > 0.12 (short doc)
      (4L, 4L, 2L, 3L, 2L, true)))   // 2/3 > 0.12
  }

  test("repetitionStats matches the relational formulation on real docs") {
    // independent oracle: the explode -> groupBy(id, bigram-hash) ->
    // groupBy(id) shape the per-row expression replaced
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = split(lower(col("text")), "\\s+")
    val bigrams = transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    val relational = d.filter(size(toks) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .select(col("doc_id"),
        graft.functions.RollingHashExpr.rolling_hash(col("bg")).as("bh"))
      .groupBy("doc_id", "bh").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(max("n").as("top_bigram_n"),
        sum("n").as("n_bigrams"))
    val perRow = CorpusOps.repetitionStats(d, "doc_id", "text")
      .select("doc_id", "top_bigram_n", "n_bigrams")
    assert(perRow.except(relational).isEmpty &&
      relational.except(perRow).isEmpty)
  }

  test("tfidfTopTerms: hand-computed scores and deterministic ranking") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val out = CorpusOps.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "token", "tf", "doc_freq", "score")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    // n_docs=2; doc_freq: apple 1, banana 2, cherry 1
    assert(out == Seq(
      (1L, 1, "apple", 2L, 1L, (2.0 / 3.0) * (2.0 / 1.0)),
      (1L, 2, "banana", 1L, 2L, (1.0 / 3.0) * (2.0 / 2.0)),
      (2L, 1, "cherry", 1L, 1L, (1.0 / 2.0) * (2.0 / 1.0)),
      (2L, 2, "banana", 1L, 2L, (1.0 / 2.0) * (2.0 / 2.0))))
  }

  test("decontaminate: sequential calls with a release between are identical") {
    // guards the Bench/Verify drain path: materialize, release, rerun —
    // results must match and no pinned frames may linger
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val r1 = CorpusOps.decontaminate(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    CorpusOps.releaseCaches(blocking = true)
    assert(CorpusOps.pinnedCount == 0)
    val r2 = CorpusOps.decontaminate(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    CorpusOps.releaseCaches(blocking = true)
    assert(r1.toSeq == r2.toSeq)
    assert(r1.nonEmpty, "sf0.001 corpus should have contaminated docs")
    assert(CorpusOps.pinnedCount == 0)
  }

  test("corpusPrepKept pins its shared projection and drains on release") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val before = CorpusOps.pinnedCount
    val kept = CorpusOps.corpusPrepKept(d, "doc_id", "text", "lang")
    assert(CorpusOps.pinnedCount > before,
      "shared text projection was not pinned")
    val n = kept.count()
    assert(n > 0, "funnel kept no documents at sf0.001")
    CorpusOps.releaseCaches(blocking = true)
    Dedup.releaseCaches(blocking = true)
    assert(CorpusOps.pinnedCount == 0 && Dedup.pinnedCount == 0)
  }

  test("corpusPrepV3 keeps exactly corpusPrepKept's docs and its span/chunk " +
       "stats are internally consistent") {
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // funnel parity: v3 shares corpusPrepKeptFromShared with v2, so the
    // kept (id, lang, n_tokens) sets must be identical
    val v2 = CorpusOps.corpusPrepKept(d, "doc_id", "text", "lang")
      .as[(Long, String, Long)].collect().toSet
    CorpusOps.releaseCaches(blocking = true)
    Dedup.releaseCaches(blocking = true)
    val v3 = CorpusOps.corpusPrepV3(d, "doc_id", "text", "lang").collect()
    assert(v3.nonEmpty, "v3 kept no documents at sf0.001")
    assert(v3.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      == v2, "v3 kept set diverges from corpusPrepKept")
    // per-doc invariants: boilerplate mass within bounds; chunk count
    // follows the all-integer window formula on n_tokens
    val stride = CorpusOps.ChunkMaxTokens - CorpusOps.ChunkOverlap
    v3.foreach { r =>
      val (nTok, nSpans, nBoiler, kept) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val chunks = r.getSeq[Long](6)
      assert(nBoiler <= nSpans && kept <= nTok,
        s"span stats out of bounds for doc ${r.getLong(0)}")
      val expChunks = 1L +
        (math.max(nTok - CorpusOps.ChunkMaxTokens, 0L) + stride - 1) / stride
      assert(chunks.length.toLong == expChunks,
        s"chunk count ${chunks.length} != $expChunks for doc ${r.getLong(0)}")
    }
    CorpusOps.releaseCaches(blocking = true)
    Dedup.releaseCaches(blocking = true)
    assert(CorpusOps.pinnedCount == 0 && Dedup.pinnedCount == 0)
  }

  test("incrementalPrepKept == corpusPrepKept(batch) ∩ " +
       "incrementalDedupKept(batch, corpus) — the composition adds " +
       "nothing and loses nothing") {
    import spark.implicits._
    // the funnel already enforces within-batch canonicals (incremental
    // rules 3-4), so intersecting with the full incremental dedup must
    // reproduce the composite exactly: the composed operator is the
    // funnel plus precisely the CROSS rules.
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val batch = d.filter(pmod(col("doc_id"), lit(3)) === 0)
    val corpus = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val funnel = CorpusOps.corpusPrepKept(batch, "doc_id", "text", "lang")
      .select("doc_id").as[Long].collect().toSet
    CorpusOps.releaseCaches(blocking = true)
    Dedup.releaseCaches(blocking = true)
    val dedup = Dedup.incrementalDedupKept(batch, corpus, "doc_id", "text")
      .as[Long].collect().toSet
    Dedup.releaseCaches(blocking = true)
    val composite = CorpusOps
      .incrementalPrepKept(batch, corpus, "doc_id", "text", "lang")
      .select("doc_id").as[Long].collect().toSet
    CorpusOps.releaseCaches(blocking = true)
    Dedup.releaseCaches(blocking = true)
    assert(composite == (funnel & dedup),
      s"composite diverges: extra=${composite -- (funnel & dedup)} " +
        s"missing=${(funnel & dedup) -- composite}")
    assert(composite.nonEmpty, "composite kept nothing at sf0.001")
  }

  test("boilerplateSpans: span chunking, doc-frequency threshold, kept mass") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g"),            // spans: "a b c d e", "f g"
      (2L, "a b c d e x"),              // spans: "a b c d e", "x"
      (3L, "a b c d e"),                // span:  "a b c d e"
      (4L, "q r s t u v w x y z")       // two unique spans
    ).toDF("doc_id", "text")
    // "a b c d e" occurs in 3 distinct docs -> boilerplate at minDocs=3
    val out = CorpusOps.boilerplateSpans(d, "doc_id", "text",
        spanTokens = 5, minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_boiler_spans", "n_tokens",
        "n_tokens_kept")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 7L, 2L),
      (2L, 2L, 1L, 6L, 1L),
      (3L, 1L, 1L, 5L, 0L),
      (4L, 2L, 0L, 10L, 10L)))
    CorpusOps.releaseCaches(blocking = true)
  }

  test("boilerplateSpans: within-doc repetition is not boilerplate") {
    import spark.implicits._
    // the same span 3x in ONE doc: doc-frequency 1, stays kept
    val d = Seq((1L, "a b c d e a b c d e a b c d e"),
                (2L, "z z z z z")).toDF("doc_id", "text")
    val out = CorpusOps.boilerplateSpans(d, "doc_id", "text", 5, 3)
      .orderBy("doc_id")
      .select("doc_id", "n_boiler_spans", "n_tokens_kept")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L, 15L), (2L, 0L, 5L)))
    CorpusOps.releaseCaches(blocking = true)
  }

  test("chunkDocs: stride/overlap windows, short docs, exact tail") {
    import spark.implicits._
    import graft.functions.RollingHashExpr
    val d = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")), // 30 toks
      (2L, "a b c"),                                  // < maxTokens
      (3L, (1 to 16).map(i => s"u$i").mkString(" "))  // exactly maxTokens
    ).toDF("doc_id", "text")
    // maxTokens=16, overlap=4 -> stride 12:
    //   doc 1: chunks at 0,12,24 -> lens 16,16,6; n_chunks = 3
    //   doc 2: 1 chunk, len 3;  doc 3: 1 chunk, len 16
    val out = CorpusOps.chunkDocs(d, "doc_id", "text", 16, 4)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_chunks", "chunk_len", "chunk_hash")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 0, 3L, 16), (1L, 1, 3L, 16), (1L, 2, 3L, 6),
      (2L, 0, 1L, 3), (3L, 0, 1L, 16)))
    // chunk content: hash recomputed independently from the same text
    val toks1 = (1 to 30).map(i => s"t$i")
    val expectHash = Seq(toks1.slice(0, 16), toks1.slice(12, 28),
      toks1.slice(24, 30)).map(c => RollingHashExpr.hash(c.mkString(" "),
      RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod))
    assert(out.filter(_._1 == 1L).map(_._5).toSeq == expectHash)
    // coverage invariant: last chunk start + last chunk len == n_tokens
    val nToks = Map(1L -> 30, 2L -> 3, 3L -> 16)
    out.groupBy(_._1).foreach { case (id, rows) =>
      val last = rows.maxBy(_._2)
      assert(last._2 * 12 + last._4 == nToks(id),
        s"doc $id: tail chunk does not end at the document end")
    }
  }

  test("mixtureSample: integer-exact rates, cap, and zero-weight strata") {
    import spark.implicits._
    import graft.functions.RollingHashExpr
    // strata: a = 10 docs, b = 5 docs, c = 2 docs (absent from weights)
    val rows = (0L to 9L).map(i => (i, "a")) ++
      (10L to 14L).map(i => (i, "b")) ++ (15L to 16L).map(i => (i, "c"))
    val d = rows.toDF("id", "lang")
    // n_total=17, W=2, budget 50%: target = (17*50*1) div 200 = 4 each;
    // keep_bp: a -> 40000 div 10 = 4000, b -> 40000 div 5 = 8000, c -> 0
    val out = CorpusOps.mixtureSample(d, "id", "lang",
        Map("a" -> 1, "b" -> 1), budgetPct = 50)
      .select("id", "lang", "target_docs", "keep_bp", "sampled")
      .as[(Long, String, Long, Long, Boolean)].collect()
    val byLang = out.groupBy(_._2)
    assert(byLang("a").forall(r => r._3 == 4L && r._4 == 4000L))
    assert(byLang("b").forall(r => r._3 == 4L && r._4 == 8000L))
    assert(byLang("c").forall(r => r._3 == 0L && r._4 == 0L && !r._5))
    // sampled iff the portable hash of the id string clears the rate —
    // recomputed here with the static function, not the Column path
    out.foreach { case (id, _, _, bp, sampled) =>
      val h = RollingHashExpr.hash(id.toString,
        RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod) % 10000
      assert(sampled == (h < bp), s"id=$id h=$h bp=$bp")
    }
    // budget 100% with a single weighted stratum: target 17 > |a|=10,
    // keep_bp capped at 10000 -> ALL of a sampled
    val capped = CorpusOps.mixtureSample(d, "id", "lang",
        Map("a" -> 1), budgetPct = 100)
      .filter(col("lang") === "a").select("keep_bp", "sampled")
      .as[(Long, Boolean)].collect()
    assert(capped.forall(r => r._1 == 10000L && r._2))
  }

  test("sourceCuration: per-source rollup, fixed-point mean, keep rule") {
    import spark.implicits._
    // src 'good': high-quality English prose; src 'bad': punctuation
    // soup scoring far below the floors; src 'mixed': one good doc +
    // one low-quality doc -> low_frac = 0.5 > ceiling, dropped
    val good = "the quick brown fox jumps over the lazy dog and it is " +
      "a fine day for running in the field with the happy dog"
    val bad = "!!! ??? ;;; ***"
    val docs = Seq(
      (1L, good, "good"), (2L, good + " again and again", "good"),
      (3L, bad, "bad"), (4L, bad + " %%%", "bad"),
      (5L, good, "mixed"), (6L, bad, "mixed")
    ).toDF("doc_id", "text", "source")

    val out = CorpusOps.sourceCuration(docs, "text")
      .select("source", "n_docs", "avg_quality", "low_frac", "kept")
      .as[(String, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    assert(out("good")._2 == 2 && out("bad")._2 == 2 && out("mixed")._2 == 2)
    assert(out("good")._5, "high-quality source must be kept")
    assert(!out("bad")._5, "low-quality source must be dropped")
    assert(out("mixed")._4 == 0.5 && !out("mixed")._5,
      "a half-bad source exceeds the low-frac ceiling")
    // the fixed-point mean agrees with a serial double mean to 1e-9
    // (the quantization bound), and low_frac is an exact ratio
    val qs = docs.select(graft.operators.TextAnalysis.qualityScore(
        col("text")).as("q"), col("source"))
      .as[(Double, String)].collect().groupBy(_._2)
    qs.foreach { case (s, rows) =>
      val serial = rows.map(r => math.floor(r._1 * 1e9) / 1e9).sum / rows.size
      assert(math.abs(out(s)._3 - serial) < 1e-12, s"mean drift for $s")
    }
  }

  /** Serial twin of the rolling hash for id strings. */
  private def rh(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % graft.operators.Dedup.P)

  test("prioritySample: exactly min(k, |stratum|) rows, bottom-k by " +
      "(hash, id), and growth only DISPLACES (never reshuffles)") {
    import spark.implicits._
    val a = (1L to 40L).map(i => (i, if (i % 3 == 0) "x" else "y")) ++
      Seq((100L, "z")) // stratum smaller than k
    val df = a.toDF("doc_id", "lang")
    val got = graft.operators.CorpusOps
      .prioritySample(df, "doc_id", "lang", 5)
      .as[(String, Int, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((stratum, members) <- a.groupBy(_._2)) {
      val expect = members.map(_._1).sortBy(id => (rh(id.toString), id)).take(5)
      val g = got(stratum)
      assert(g.map(_._3) == expect, s"stratum $stratum")
      assert(g.map(_._4) == expect.map(id => rh(id.toString)), s"$stratum priorities")
      assert(g.map(_._2) == (1 to g.size), s"$stratum ranks")
    }
    assert(got("z").size == 1) // min(k, |stratum|)
    // growth property: doubling the corpus keeps each retained member
    // of the old sample iff it still wins on priority — the new sample
    // is the bottom-k of the UNION, never a reshuffle
    val b = a ++ (41L to 80L).map(i => (i, if (i % 3 == 0) "x" else "y"))
    val got2 = graft.operators.CorpusOps
      .prioritySample(b.toDF("doc_id", "lang"), "doc_id", "lang", 5)
      .as[(String, Int, Long, Long)].collect().toSeq.groupBy(_._1)
    for ((stratum, members) <- b.groupBy(_._2)) {
      val expect = members.map(_._1).sortBy(id => (rh(id.toString), id)).take(5)
      assert(got2(stratum).sortBy(_._2).map(_._3) == expect, s"grown $stratum")
    }
  }

  test("weightedPrioritySample: bottom-k by (hash·2^20) div w, zero/neg " +
      "weights excluded, growth only displaces") {
    import spark.implicits._
    def key(id: Long, w: Long): Long =
      math.floorDiv(rh(id.toString) * (1L << 20), w)
    val a = (1L to 60L).map(i => (i, (i % 7) + 1)) ++
      Seq((200L, 0L), (201L, -5L)) // excluded by definition
    val got = graft.operators.CorpusOps
      .weightedPrioritySample(a.toDF("doc_id", "wt"), "doc_id", "wt", 8)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val eligible = a.filter(_._2 > 0)
    val expect = eligible.sortBy { case (id, w) => (key(id, w), id) }.take(8)
    assert(got.map(_._2) == expect.map(_._1))
    assert(got.map(_._3) == expect.map(_._2)) // weights recovered
    assert(got.map(_._4) == expect.map { case (id, w) => key(id, w) })
    assert(!got.exists(r => r._2 == 200L || r._2 == 201L))
    // growth: the grown sample is the bottom-k of the union
    val b = a ++ (61L to 120L).map(i => (i, (i % 5) + 1))
    val got2 = graft.operators.CorpusOps
      .weightedPrioritySample(b.toDF("doc_id", "wt"), "doc_id", "wt", 8)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expect2 = b.filter(_._2 > 0)
      .sortBy { case (id, w) => (key(id, w), id) }.take(8)
    assert(got2.map(_._2) == expect2.map(_._1))
  }

  test("temperatureMixWeights: sqrt-weighting boosts the tail, " +
      "shares sum to <= 1, targets respect the budget") {
    import spark.implicits._
    // 10000 docs from 'head', 100 from 'tail': raw ratio 100:1 but
    // sqrt ratio 10:1 — the tail's share must rise from ~1% to ~9%
    val rows = (1L to 10000L).map(i => (i, "head")) ++
      (1L to 100L).map(i => (10000L + i, "tail"))
    val got = graft.operators.CorpusOps
      .temperatureMixWeights(rows.toDF("doc_id", "source"), "source",
        budget = 10000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (headW, tailW) = (got("head")._3, got("tail")._3)
    assert(headW == 100000000L && tailW == 10000000L) // 1e6*sqrt(n)
    assert(got("tail")._4 == 90909L) // 1e7 * 1e6 div 1.1e8 ppm
    assert(got.values.map(_._4).sum <= 1000000L) // truncating shares
    assert(got.values.map(_._5).sum <= 10000L)   // budget respected
    // tail upsampled ~9x (909 targets / 100 docs), head downsampled
    assert(got("tail")._6 > 9000L && got("head")._6 < 1000L)
  }

  test("qualityCalibration: per-source value-percentile matches a " +
      "serial rank computation; ties share the value's percentile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x x x x x x x x x x x x"), // varied quality per text
      (2L, "a", "one two three four five six seven eight nine ten"),
      (3L, "a", "!!! ??? ### $$$"),
      (4L, "a", "the quick brown fox jumps over the lazy dog again"),
      (5L, "b", "alpha beta gamma delta epsilon zeta eta theta"),
      (6L, "b", "!!!"),
      (7L, "b", "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.CorpusOps
      .qualityCalibration(docs, "doc_id", "text", "source")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // serial replay: per source, percentile = strictly-below count
    // * 1000 div (n-1)
    val qs = got.values.map(r => (r._1, r._2, r._3)).toSeq
    for ((id, src, qm) <- qs) {
      val same = qs.filter(_._2 == src)
      val below = same.count(_._3 < qm).toLong
      val expect = below * 1000L / math.max(same.size - 1L, 1L)
      assert(got(id)._4 == expect, s"doc $id")
      assert(got(id)._5 == (expect >= 500L))
    }
    // docs 5 and 7 are identical text: same q_milli, same percentile
    assert(got(5L)._3 == got(7L)._3 && got(5L)._4 == got(7L)._4)
  }

  test("ppmiCooccurrence: hand-computed skip-gram pairs, pair-event " +
      "marginals, and fixed-point log2 against the BigInt reference") {
    import spark.implicits._
    // one doc "a b a b": window-2 forward pairs:
    //   (a,b) x2 [i=1,3->j1; i=3 has only j=1], (b,a) x1, (a,a) x1, (b,b) x1
    // pairs: i=1: (a,b),(a,a); i=2: (b,a),(b,b); i=3: (a,b) -> N=5
    val d = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = CorpusOps.ppmiCooccurrence(d, "doc_id", "text",
        window = 2, minCount = 2)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // only (a,b) passes minCount=2: c_pair=2, c_l(a)=3, c_r(b)=3,
    // num=2*5=10, den=9 -> ppmi_q8 = floor(256*log2(10/9))
    val expectQ8 = graft.operators.Ranking.log2FixedRef(
      BigInt(10), BigInt(9), 8)
    assert(got == Seq(("a", "b", 2L, 3L, 3L, expectQ8)))
    CorpusOps.releaseCaches(blocking = true)
  }
}
