package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{RollingHashExpr, SimHashExpr, SortedIntersectSizeExpr,
  TokenHashesExpr}

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docA  = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docA2 = "the quick brown fox jumps over the lazy dog near the river bank now" // 1-word edit
  private val docB  = "completely different content about spark catalyst optimizer internals and planning"

  private def docs = Seq((1L, docA), (2L, docA2), (3L, docB), (4L, docA))
    .toDF("doc_id", "text")

  test("shingles: distinct word n-grams; short texts collapse to one shingle") {
    val sh = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq("a b"))
  }

  test("token_hashes == transform(split(lower(text)), rolling_hash) " +
       "(native pass matches the definitional pipeline the oracle mirrors)") {
    val tricky = Seq((1L, docA), (2L, "  leading and   multiple   spaces "),
      (3L, ""), (4L, "MiXeD Case\tTAB\nnewline"), (5L, "solo"))
      .toDF("doc_id", "text")
    val got = tricky
      .select($"doc_id", TokenHashesExpr.token_hashes($"text").as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = tricky
      .select($"doc_id", transform(split(lower($"text"), "\\s+"),
        t => RollingHashExpr.rolling_hash(t)).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == want)
    // multiplicity is preserved (NOT deduplicated — SimHash votes)
    val multi = Seq((1L, "a b a")).toDF("doc_id", "text")
      .select(TokenHashesExpr.token_hashes($"text")).as[Seq[Long]].head()
    assert(multi.length == 3 && multi(0) == multi(2))
  }

  test("minhash: identical texts get identical signatures, disjoint texts differ") {
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text", 3).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs.values.forall(_.length == Dedup.Coeffs.size))
    assert(sigs(1L) != sigs(3L))
    // near-dup pair agrees on most components (deterministic fixture)
    val agree = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(agree >= Dedup.Coeffs.size / 2, s"only $agree components agree")
  }

  test("lshNearDups finds the near-dup and exact pairs, not the unrelated one") {
    val pairs = Dedup.lshNearDups(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.6)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("incrementalDedupKept: cross-exact, cross-near, and within-batch " +
       "rules each drop their doc; unique docs survive") {
    val docF  = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docF2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu" // near-dup of F
    val docG  = "entirely unrelated content about adaptive query execution and shuffles"
    val existing = Seq((2L, docA), (4L, docB)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, docA2), // near-dup of existing 2      -> dropped (cross-near)
      (3L, docB),  // exact dup of existing 4     -> dropped (cross-exact)
      (5L, docF),  // batch cluster canonical     -> KEPT
      (7L, docF2), // near-dup of 5 within batch  -> dropped (rule 4)
      (9L, docG),  // unique                      -> KEPT
      (11L, docF)  // exact dup of 5 within batch -> dropped (rule 3)
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedupKept(batch, existing, "doc_id", "text")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 9L))
    Dedup.releaseCaches(blocking = true)
    // empty existing corpus degenerates to plain within-batch dedup
    val keptAll = Dedup.incrementalDedupKept(batch,
        existing.filter($"doc_id" < 0), "doc_id", "text")
      .as[Long].collect().sorted
    assert(keptAll.toSeq == Seq(1L, 3L, 5L, 9L))
    Dedup.releaseCaches(blocking = true)
  }

  test("editNearDups: Levenshtein verify on LSH candidates, exact counts") {
    // docA -> docA2 is a one-word suffix edit ("today" -> "now"), unit
    // cost 4 (best alignment: t->n, o kept, d->o, a->w, delete "y"...
    // the DP finds 4); docA == doc 4 at 0 edits; docB never pairs (no
    // band collision, and 60+ edits away regardless)
    val out = Dedup.editNearDups(docs, "doc_id", "text", maxEdits = 10)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(out((1L, 4L)) == 0)
    assert(out((1L, 2L)) == 4 && out((2L, 4L)) == 4)
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    // a budget below the true distance excludes the mutated pair but
    // keeps the exact one
    val tight = Dedup.editNearDups(docs, "doc_id", "text", maxEdits = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(tight == Set((1L, 4L)))
    Dedup.releaseCaches(blocking = true)
  }

  test("lshNearDups matches allPairsJaccard on data where LSH should catch everything") {
    val lsh = Dedup.lshNearDups(docs, "doc_id", "text").select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val brute = Dedup.allPairsJaccard(docs, "doc_id", "text").select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(brute.subsetOf(lsh), s"LSH missed ${brute -- lsh}")
  }

  test("sorted_intersect_size == size(array_intersect) incl. duplicate runs") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 5L)), // dups count once
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(7L), Seq(7L)),
      (Seq(1L, 5L, 9L), Seq(2L, 6L, 10L))).toDF("a", "b")
    val got = cases.select(
        SortedIntersectSizeExpr.sorted_intersect_size($"a", $"b").as("g"),
        size(array_intersect($"a", $"b")).as("w"))
      .as[(Int, Int)].collect()
    assert(got.forall { case (g, w) => g == w },
      s"mismatch: ${got.mkString(", ")}")
  }

  test("jaccardNearDups (prefix filter) == allPairsJaccard at several " +
       "thresholds, values included (exactness, not just recall)") {
    // varied corpus: exact dups, a near-dup chain, short docs, unrelated
    val corpus = (docs.collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((5L, "a b"), (6L, "a b"), (7L, "a b c"),
        (8L, docA + " extra trailing words appended here"),
        (9L, "totally disjoint vocabulary nine"))).toSeq
      .toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val fast = Dedup.jaccardNearDups(corpus, "doc_id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      val brute = Dedup.allPairsJaccard(corpus, "doc_id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == brute, s"threshold $t: ${fast.diff(brute)} extra, " +
        s"${brute.diff(fast)} missed")
      spark.catalog.clearCache()
    }
  }

  test("property: jaccardNearDups == allPairsJaccard on random corpora " +
       "(word soups with shared vocabulary and duplicates)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nDocs <- Gen.choose(3, 15)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 25)
        words <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield words.mkString(" "))
      // inject an exact duplicate so hamming-0/identical-set paths hit
      dupOf <- Gen.choose(0, nDocs - 1)
    } yield (docs :+ docs(dupOf)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // deterministic samples: no scalatestplus bridge in the offline cache
    (1 to 6).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { rows =>
        val df = rows.toDF("doc_id", "text")
        for (t <- Seq(0.4, 0.7)) {
          val fast = Dedup.jaccardNearDups(df, "doc_id", "text", 2, t)
            .as[(Long, Long, Double)].collect().toSet
          val brute = Dedup.allPairsJaccard(df, "doc_id", "text", 2, t)
            .as[(Long, Long, Double)].collect().toSet
          assert(fast == brute,
            s"t=$t corpus=$rows: ${brute.diff(fast)} missed, ${fast.diff(brute)} extra")
          spark.catalog.clearCache()
        }
      }
  }

  test("lshNearDups maxBucketSize drops degenerate buckets, default keeps them") {
    // 6 identical docs: every band bucket holds all 6
    val clones = (1L to 6L).map(i => (i, docA)).toDF("doc_id", "text")
    val uncapped = Dedup.lshNearDups(clones, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15) // all C(6,2) pairs
    val capped = Dedup.lshNearDups(clones, "doc_id", "text",
      maxBucketSize = Some(3L))
    assert(capped.count() == 0) // every bucket oversized -> dropped
  }

  test("exactDedup collapses case/punct/spacing variants to one canonical id") {
    val df = Seq(
      (10L, "Hello,   World!"), (11L, "hello world"), (12L, "HELLO WORLD."),
      (13L, "something else")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .select($"doc_id", $"canonical_id", $"group_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (10L, 10L, 3L, true), (11L, 10L, 3L, false),
      (12L, 10L, 3L, false), (13L, 13L, 1L, true)))
  }

  test("simhash: identical equal; near-dup closer than unrelated (Hamming)") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    // matches a direct scala computation of the same definition
    val toks = docA.toLowerCase.split("\\s+")
    val hashes = toks.map(t => graft.functions.RollingHashExpr.hash(t, 31, 1000000007L))
    val expected = {
      var packed = 0L
      for (b <- 0 until SimHashExpr.NumBits) {
        val votes = hashes.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) packed |= (1L << b)
      }
      packed
    }
    assert(sh(1L) == expected)
  }

  test("simhashNearDups == brute-force Hamming ball (banding is exact)") {
    // corpus with exact dups, a near-dup, and unrelated content
    val corpus = docs.union(Seq(
      (5L, "yet another wholly unrelated document concerning distributed joins"),
      (6L, docA2)).toDF("doc_id", "text"))
    val maxH = 3
    val got = Dedup.simhashNearDups(corpus, "doc_id", "text", maxH)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over all pairs of fingerprints
    val sh = corpus.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
    } yield (a, b, h.toLong)).toSet
    assert(got == brute)
    // sanity: the exact dups are in, the unrelated doc is not paired
    // with the docA family
    assert(got.contains((1L, 4L, 0L)))
    assert(!got.exists { case (a, b, _) =>
      Set(a, b).contains(3L) && Set(a, b).intersect(Set(1L, 2L, 4L, 6L)).nonEmpty })
  }

  test("nearDupClusters groups transitive pairs, keeps singletons, min-id canonical") {
    // 1≈2 (edit), 1=4 (exact) ⇒ {1,2,4} one transitive cluster even if
    // 2–4 alone wouldn't pair; 3 is a singleton
    val got = Dedup.nearDupClusters(docs, "doc_id", "text")
      .select($"doc_id", $"cluster", $"cluster_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (4L, 1L, 3L, false),
      (3L, 3L, 1L, true)))
  }

  test("nearDupClusters on a pair-free corpus is all singletons") {
    val solo = Seq((10L, docA), (20L, docB)).toDF("doc_id", "text")
    val got = Dedup.nearDupClusters(solo, "doc_id", "text")
      .select($"doc_id", $"cluster", $"cluster_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((10L, 10L, 1L, true), (20L, 20L, 1L, true)))
  }

  test("property: nearDupClusters == union-find over lshNearDups pairs " +
       "on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    // random docs built from a tiny vocabulary so near-dups are common
    val corpusGen = for {
      n <- Gen.choose(2, 15)
      docs <- Gen.listOfN(n, Gen.choose(5, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 6).flatMap(i => corpusGen.apply(Gen.Parameters.default,
        Seed(100L + i))).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.lshNearDups(df, "doc_id", "text")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      // driver-side union-find over the same pair set = ground truth
      val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = docs.map { case (id, _) => id -> find(id) }.toMap
      val got = Dedup.nearDupClusters(df, "doc_id", "text")
        .select($"doc_id", $"cluster").as[(Long, Long)].collect().toMap
      assert(got == expected, s"docs=${docs.size} pairs=${pairs.length}")
    }
  }

  test("hammingDistance column matches bitCount") {
    val d = Seq((5L, 9L)).toDF("a", "b")
      .select(Dedup.hammingDistance($"a", $"b")).as[Int].head()
    assert(d == java.lang.Long.bitCount(5L ^ 9L))
  }

  test("substringDupSpans: cross-doc spans merge, disjoint spans " +
       "stay split, intra-doc repeats and short docs are excluded") {
    // k=4. d1/d2 share the run "a b c d e f" (3 overlapping windows
    // -> ONE merged span); d5 shares "a b c d" with d1/d2 and
    // "h x y z" with d1 at separated positions (-> TWO spans, and
    // they promote d1's window 8 to a second d1 span); d3 shares
    // nothing; d4 is shorter than k (omitted); d6 repeats a gram
    // only WITHIN itself (not duplicated: >= 2 DOCS is the contract)
    val df = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "q r a b c d e f s t"),
      (3L, "a b c m n o p q r s"),
      (4L, "u v w"),
      (5L, "a b c d k1 k2 k3 h x y z"),
      (6L, "m1 m2 m3 m4 m1 m2 m3 m4")).toDF("doc_id", "text")
    try {
      val got = Dedup.substringDupSpans(df, "doc_id", "text", k = 4)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq(
        (1L, 11L, 2L, 10L, 909L),   // [1,7) + [8,12), 10000/11
        (2L, 10L, 1L, 6L, 600L),    // [3,9)
        (3L, 10L, 0L, 0L, 0L),
        (5L, 11L, 2L, 8L, 727L),    // [1,5) + [8,12), 8000/11
        (6L, 8L, 0L, 0L, 0L)))
    } finally Dedup.releaseCaches(blocking = true)
  }

  test("scrubDupSpans: spans cut from the token stream, short docs " +
       "pass through, remaining text re-joined in position order") {
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "q r a b c d e f s t"),
      (3L, "a b c m n o p q r s"),
      (4L, "u v w"),
      (5L, "a b c d k1 k2 k3 h x y z"),
      (6L, "m1 m2 m3 m4 m1 m2 m3 m4")).toDF("doc_id", "text")
    try {
      val got = Dedup.scrubDupSpans(df, "doc_id", "text", k = 4)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got == Seq(
        (1L, 11L, 1L, m("g")),                     // [1,7)+[8,12) cut
        (2L, 10L, 4L, m("q r s t")),               // [3,9) cut
        (3L, 10L, 10L, m("a b c m n o p q r s")),  // untouched
        (4L, 3L, 3L, m("u v w")),                  // shorter than k
        (5L, 11L, 3L, m("k1 k2 k3")),              // [1,5)+[8,12) cut
        (6L, 8L, 8L, m("m1 m2 m3 m4 m1 m2 m3 m4"))))
    } finally Dedup.releaseCaches(blocking = true)
  }
}
