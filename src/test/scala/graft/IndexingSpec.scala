package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Indexing

class IndexingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("invertedIndex: postings ascending and complete under the cap; " +
       "hot terms keep only their count") {
    val docs = Seq(
      (10L, "alpha beta"),
      (2L, "beta gamma alpha"),
      (7L, "beta beta beta"), // multiplicity inside a doc counts once
      (5L, "gamma")).toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(docs, "doc_id", "text", dfCap = 2)
      .orderBy("term")
      .as[(String, Long, Option[String])].collect().toSeq
    assert(idx == Seq(
      // beta: df=3 > cap → no postings, count kept
      ("alpha", 2L, Some("2,10")), // ascending NUMERIC doc order
      ("beta", 3L, None),
      ("gamma", 2L, Some("2,5"))))
  }

  test("invertedIndex: empty tokens dropped; cap boundary inclusive") {
    val docs = Seq((1L, "  x "), (2L, "x")).toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(docs, "doc_id", "text", dfCap = 2)
      .as[(String, Long, Option[String])].collect().toSeq
    assert(idx == Seq(("x", 2L, Some("1,2"))))
  }

  test("bpePairCounts: pair counts weighted by word frequency; " +
       "single-char words excluded; ties rank by pair") {
    // word freqs: "abc" x2, "ab" x1, "a" excluded (len 1)
    // pairs: abc -> ab,bc (x2 each); ab -> ab (x1)
    // totals: ab=3, bc=2
    val docs = Seq((1L, "abc ab a"), (2L, "ABC")).toDF("doc_id", "text")
    val got = Indexing.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("bc", 2L)))
  }

  test("corpusShuffle: a permutation — every doc exactly once, seq " +
       "contiguous per batch, deterministic across runs") {
    val docs = (1L to 400L).map(i => Tuple1(i)).toDF("doc_id")
    val a = Indexing.corpusShuffle(docs, "doc_id", nBatches = 8)
      .as[(Int, Int, Long)].collect().toSeq.sorted
    // every doc exactly once
    assert(a.map(_._3).sorted == (1L to 400L))
    // per batch: seq is 1..|batch| with no gaps
    a.groupBy(_._1).foreach { case (b, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.size),
        s"batch $b seq not contiguous")
    }
    // all batches in range and used (400 docs over 8 hash shards)
    assert(a.map(_._1).toSet.subsetOf((0 to 7).toSet))
    assert(a.map(_._1).distinct.size == 8)
    // deterministic: a second evaluation is identical
    val b = Indexing.corpusShuffle(docs, "doc_id", nBatches = 8)
      .as[(Int, Int, Long)].collect().toSeq.sorted
    assert(a == b)
  }

  test("corpusShuffle: intra-batch order is not doc-id order (it is " +
       "a shuffle, not a sort)") {
    val docs = (1L to 400L).map(i => Tuple1(i)).toDF("doc_id")
    val rows = Indexing.corpusShuffle(docs, "doc_id", nBatches = 2)
      .orderBy("batch_id", "seq")
      .as[(Int, Int, Long)].collect().toSeq
    val someBatch = rows.filter(_._1 == rows.head._1).map(_._3)
    assert(someBatch != someBatch.sorted,
      "intra-batch order degenerated to ascending doc_id")
  }

  test("ngramFamiliarity: the corpus is scanned once — the df side " +
       "reuses the (doc, bigram) distinct exchange at runtime") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fam = graft.operators.Indexing.ngramFamiliarity(docs, "doc_id", "text")
    fam.collect()
    // AQE's stage cache must serve the bigram-df branch from the same
    // shuffle the probe side wrote — otherwise the text is tokenized
    // twice, a second full corpus pass at 100 TB
    val finalPlan = fam.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      "bigram-df branch re-derived the corpus instead of reusing the " +
        "distinct exchange")
  }

  test("ngramFamiliarity: hand-computed on a fixture; <2-token docs omitted") {
    // bigrams (distinct per doc):
    //   d1 "a b c"  -> {a b, b c}
    //   d2 "a b"    -> {a b}
    //   d3 "b c a b"-> {b c, c a, a b}
    //   d4 "x"      -> omitted (no bigrams)
    // df: "a b" -> 3, "b c" -> 2, "c a" -> 1
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "b c a b"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = Indexing.ngramFamiliarity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, (3.0 + 2.0) / 2),
      (2L, 1L, 3.0),
      (3L, 3L, (2.0 + 1.0 + 3.0) / 3)))
  }

  test("sparseCosineTopK: hand-computed fixture; df cap prunes; ties " +
       "break on nbr id") {
    val docs = Seq((1L, "apple banana"), (2L, "apple banana"),
      (3L, "apple cherry"), (4L, "zebra")).toDF("doc_id", "text")
    // df: apple 3, banana 2 (kept); cherry/zebra df=1 (unpairable)
    val got = Indexing.sparseCosineTopK(docs, "doc_id", "text",
        dfMax = 50, k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val r2 = 1.0 / math.sqrt(2.0)
    // the contract is the exact IEEE chain dot/(sqrt(na)*sqrt(nb)) —
    // the same expression the oracle replays — NOT the algebraic
    // value: sqrt(2)*sqrt(2) rounds to 2.0000000000000004
    val self = 2.0 / (math.sqrt(2.0) * math.sqrt(2.0))
    assert(got == Seq(
      (1L, 1, 2L, self), (1L, 2, 3L, r2),
      (2L, 1, 1L, self), (2L, 2, 3L, r2),
      // d3 ties at r2 with both; nbr id breaks the tie
      (3L, 1, 1L, r2), (3L, 2, 2L, r2)).sorted)
    // dfMax=2 drops apple (df=3): only banana pairs d1-d2
    val capped = Indexing.sparseCosineTopK(docs, "doc_id", "text",
        dfMax = 2, k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(capped == Seq((1L, 1, 2L, 1.0), (2L, 1, 1L, 1.0)).sorted)
  }


  test("bpeLearn matches a serial BPE trainer on a fixture") {
    // corpus: "low low low lower lower newest newest newest newest"
    val docs = Seq((1L, "low low low lower"),
      (2L, "lower newest newest"), (3L, "newest newest")).toDF("doc_id", "text")
    // serial reference: same vocab -> pair-count -> argmax -> greedy
    def serial(words: Map[String, Long], n: Int) = {
      var vocab = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      var out = Vector.empty[(Int, String, String, String, Long)]
      for (r <- 1 to n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; Vector(a, b) <- syms.sliding(2))
          counts((a, b)) = counts.getOrElse((a, b), 0L) + f
        val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out :+= ((r, l, rr, l + rr, c))
        vocab = vocab.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms)
            if (acc.nonEmpty && acc.last == l && x == rr)
              acc(acc.size - 1) = l + rr
            else acc += x
          (acc.toVector, f)
        }
      }
      out
    }
    val words = Map("low" -> 3L, "lower" -> 2L, "newest" -> 4L)
    val want = serial(words, 6)
    val got = Indexing.bpeLearn(docs, "text", 6)
      .as[(Int, String, String, String, Long)].collect().toVector
    assert(got == want)
  }


  test("bpeLearnBatched at batchK=1, window=1 reduces exactly to " +
       "bpeLearn's one-merge-per-pass sequence") {
    val docs = Seq((1L, "low low low lower"),
      (2L, "lower newest newest"), (3L, "newest newest")).toDF("doc_id", "text")
    val classic = Indexing.bpeLearn(docs, "text", 6)
      .as[(Int, String, String, String, Long)].collect().toVector
    val batched = Indexing.bpeLearnBatched(docs, "text", passes = 6,
        batchK = 1, window = 1)
      .as[(Int, Int, String, String, String, Long)].collect().toVector
    assert(batched.map(t => (t._1, t._3, t._4, t._5, t._6)) == classic)
    // one merge per pass -> pass equals rank
    assert(batched.forall(t => t._1 == t._2))
  }

  test("bpeLearnBatched: within a pass no two merges interact " +
       "(disjoint {left, right, merged} sets), ranks dense, pass " +
       "yield bounded by batchK") {
    val docs = Seq((1L, "low low low lower lower"),
      (2L, "newest newest newest widest widest")).toDF("doc_id", "text")
    val out = Indexing.bpeLearnBatched(docs, "text", passes = 3,
        batchK = 4, window = 32)
      .as[(Int, Int, String, String, String, Long)].collect().toVector
    assert(out.map(_._1) == (1 to out.size).toVector, s"ranks: $out")
    out.groupBy(_._2).foreach { case (p, ms) =>
      assert(ms.size <= 4, s"pass $p over batchK: $ms")
      val sets = ms.map(m => Set(m._3, m._4, m._5))
      for (i <- sets.indices; j <- 0 until i)
        assert(sets(i).intersect(sets(j)).isEmpty,
          s"pass $p merges interact: ${ms(j)} vs ${ms(i)}")
    }
    // batching actually batches: fewer passes than merges
    assert(out.map(_._2).distinct.size < out.size)
  }

  test("bpeLearnPhrases matches a serial phrase-BPE trainer (token " +
       "symbols, minimal non-interaction rule, sequential batch " +
       "application)") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "the dog sat on the mat and the dog ran"),
      (3L, "a cat and a dog sat on a mat"),
      (4L, "the cat and the dog ran on the mat")).toDF("doc_id", "text")
    def serial(texts: Seq[String], passes: Int, batchK: Int,
               window: Int) = {
      var seqs = texts.map(_.toLowerCase.split("\\s+").toVector
          .filter(_.nonEmpty)).filter(_.size >= 2)
        .groupBy(identity).map { case (s, xs) => (s, xs.size.toLong) }
        .toVector
      var out = Vector.empty[(Int, Int, String, String, String, Long)]
      var rank = 0
      for (p <- 1 to passes) {
        val counts = scala.collection.mutable
          .Map.empty[(String, String), Long]
        for ((syms, f) <- seqs; Vector(a, b) <- syms.sliding(2))
          counts((a, b)) = counts.getOrElse((a, b), 0L) + f
        val cands = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(window)
        val (ls, rs, ms) = (scala.collection.mutable.Set.empty[String],
          scala.collection.mutable.Set.empty[String],
          scala.collection.mutable.Set.empty[String])
        val picked = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        for (((l, r), n) <- cands if picked.size < batchK) {
          val m = l + " " + r
          if (!ls(r) && !rs(l) && !ls(m) && !rs(m) && !ms(m) &&
              !ms(l) && !ms(r)) {
            picked += ((l, r, n)); ls += l; rs += r; ms += m
          }
        }
        for ((l, r, n) <- picked) {
          rank += 1
          out :+= ((rank, p, l, r, l + " " + r, n))
          seqs = seqs.map { case (syms, f) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            for (x <- syms)
              if (acc.nonEmpty && acc.last == l && x == r)
                acc(acc.size - 1) = l + " " + r
              else acc += x
            (acc.toVector, f)
          }
        }
      }
      out
    }
    val want = serial(docs.as[(Long, String)].collect().map(_._2).toSeq,
      passes = 3, batchK = 6, window = 64)
    val got = Indexing.bpeLearnPhrases(docs, "text", passes = 3,
        batchK = 6, window = 64)
      .as[(Int, Int, String, String, String, Long)].collect().toVector
    assert(got == want)
    // the rule is genuinely WEAKER than strict disjointness: at least
    // one pass accepts two picks sharing a left or right operand
    val shares = got.groupBy(_._2).values.exists { ms =>
      val ls = ms.map(_._3); val rs = ms.map(_._4)
      ls.distinct.size < ls.size || rs.distinct.size < rs.size
    }
    assert(shares, s"no shared operands in any pass: $got")
    // and still non-interacting: no chains, no merged-unit collisions
    got.groupBy(_._2).values.foreach { ms =>
      val L = ms.map(_._3).toSet; val R = ms.map(_._4).toSet
      val M = ms.map(_._5).toSet
      ms.foreach { m =>
        assert(!L(m._4) || m._4 == m._3, s"chain r=l: $m in $ms")
        assert(!R(m._3) || m._3 == m._4, s"chain l=r: $m in $ms")
        assert(!L(m._5) && !R(m._5), s"merged collides: $m")
        assert(!M(m._3) && !M(m._4), s"operand is a merged unit: $m")
      }
    }
  }

  test("bpeLearnPhrasesIncremental: the maintained pair-count table " +
       "yields the byte-identical merge table to the full-recount " +
       "path over multiple passes") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "the dog sat on the mat and the dog ran"),
      (3L, "a cat and a dog sat on a mat"),
      (4L, "the cat and the dog ran on the mat"),
      (5L, "a mat and a cat ran on the dog")).toDF("doc_id", "text")
    val recount = Indexing.bpeLearnPhrases(docs, "text", passes = 4,
        batchK = 5, window = 64)
      .as[(Int, Int, String, String, String, Long)].collect().toVector
    val incr = Indexing.bpeLearnPhrasesIncremental(docs, "text",
        passes = 4, batchK = 5, window = 64)
      .as[(Int, Int, String, String, String, Long)].collect().toVector
    assert(incr == recount)
    // the test is only meaningful if merges actually happened across
    // several passes (deltas compounding on the maintained table)
    assert(recount.map(_._2).distinct.size >= 3, s"got: $recount")
  }

  test("bpeLearnPhrases: batch application equals INDEPENDENT per-rule " +
       "application on the pre-pass corpus — the property the " +
       "simultaneous-fold oracle relies on") {
    val docs = Seq(
      (1L, "x y x y z w z w x y z w"),
      (2L, "p q p q r s r s p q r s")).toDF("doc_id", "text")
    val out = Indexing.bpeLearnPhrases(docs, "text", passes = 1,
        batchK = 8, window = 64)
      .as[(Int, Int, String, String, String, Long)].collect()
    assert(out.nonEmpty)
    // apply pass-1 picks (a) sequentially in rank order and (b) each
    // independently then merged by position — equal sequences
    val seqs = Seq("x y x y z w z w x y z w".split(" ").toVector,
      "p q p q r s r s p q r s".split(" ").toVector)
    def applyOne(s: Vector[String], l: String, r: String) = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- s)
        if (acc.nonEmpty && acc.last == l && x == r)
          acc(acc.size - 1) = l + " " + r
        else acc += x
      acc.toVector
    }
    for (s <- seqs) {
      val sequential = out.foldLeft(s) { case (cur, m) =>
        applyOne(cur, m._3, m._4) }
      val anyOrder = out.reverse.foldLeft(s) { case (cur, m) =>
        applyOne(cur, m._3, m._4) }
      assert(sequential == anyOrder,
        s"order-dependent batch on $s: ${out.toVector}")
    }
  }

  test("bpeEncode applies learned merges greedily; counts the encoded " +
       "distribution") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // vocab: aaab freq 2, ab freq 1. merge 1: (a,a) n=4 -> "aa"
    // aaab -> [aa,a,b]; ab -> [a,b]
    val m1 = Seq(("a", "a", "aa"))
    val got1 = Indexing.bpeEncode(docs, "text", m1, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got1 == Map("aa" -> 2L, "a" -> 3L, "b" -> 3L))
    // adding merge (a,b): aaab -> [aa,ab]; ab -> [ab]
    val m2 = m1 :+ (("a", "b", "ab"))
    val got2 = Indexing.bpeEncode(docs, "text", m2, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got2 == Map("aa" -> 2L, "ab" -> 3L))
  }


  test("phraseSearch: adjacency not co-occurrence; overlapping and " +
      "repeated matches counted; positions are array indices") {
    val docs = Seq(
      (1L, "new york new york"),      // 2 matches at pos 0, 2
      (2L, "york new"),               // co-occurrence, wrong order
      (3L, "new deal in york"),       // co-occurrence, not adjacent
      (4L, "a new york b new york"),  // 2 matches at pos 1, 4
      (5L, "nothing here")).toDF("doc_id", "text")
    val got = Indexing.phraseSearch(docs, "doc_id", "text",
        Seq("new", "york"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 0), (4L, 2L, 1)))
  }

  test("phraseSearch: repeated term inside the phrase; single-term " +
      "phrase degrades to term occurrences") {
    val docs = Seq(
      (1L, "go go go"),          // "go go" matches at 0 and 1
      (2L, "go stop go")).toDF("doc_id", "text")
    val two = Indexing.phraseSearch(docs, "doc_id", "text", Seq("go", "go"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(two == Seq((1L, 2L, 0)))
    val one = Indexing.phraseSearch(docs, "doc_id", "text", Seq("go"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(one == Seq((1L, 3L, 0), (2L, 2L, 0)))
  }

  test("phraseSearch rejects multi-word or empty terms") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Indexing.phraseSearch(docs, "doc_id", "text", Seq("a b"))
    }
    intercept[IllegalArgumentException] {
      Indexing.phraseSearch(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("bpeFertility: languageId is evaluated per DOCUMENT — no " +
       "stop_counts projection above the token explode (the collapsed " +
       "single-select shape measured 17x expression blow-up)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Indexing.bpeFertility(docs, "doc_id", "text",
        Seq(("t", "h", "th"), ("th", "e", "the")))
      .queryExecution.sparkPlan
    val p = plan.toString
    // any Project computing stop_counts with a Generate BELOW it is
    // the per-token re-evaluation pathology
    val bad = plan.collect {
      case pr: org.apache.spark.sql.execution.ProjectExec
          if pr.projectList.exists(_.toString.contains("stop_counts")) &&
            pr.collectFirst {
              case g: org.apache.spark.sql.execution.GenerateExec => g
            }.isDefined => pr
    }
    assert(bad.isEmpty, s"languageId re-evaluated per token:\n$p")
    assert(p.contains("Join"), s"lang branch lost its doc-keyed join:\n$p")
  }

  test("bpeFertility: per-language symbol cost under a fixed merge " +
       "table, >= 2-char vocabulary contract, truncating per-mille") {
    val docs = Seq(
      (1L, "the cat and the dog and the cow"),
      (2L, "der hund und die katze und der")).toDF("doc_id", "text")
    val langs = docs.select($"doc_id",
        graft.operators.TextAnalysis.languageId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(langs(1L) != langs(2L), s"fixture langs collapsed: $langs")
    val merges = Seq(("t", "h", "th"), ("th", "e", "the"))
    val got = Indexing.bpeFertility(docs, "doc_id", "text", merges)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc1: the×3 (1 sym via th+e), cat, and×2, dog, cow (3 each)
    //   vocab 5, words 8, syms 3+3+6+3+3 = 18 -> 18000 div 8 = 2250
    assert(got(langs(1L)) == ((5L, 8L, 18L, 2250L)))
    // doc2: der×2, hund(4), und×2, die, katze(5) — no merge applies
    //   vocab 5, words 7, syms 6+4+6+3+5 = 24 -> 24000 div 7 = 3428
    assert(got(langs(2L)) == ((5L, 7L, 24L, 3428L)))
  }
}
