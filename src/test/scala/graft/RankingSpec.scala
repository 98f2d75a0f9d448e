package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking

class RankingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  override def afterAll(): Unit = {
    Ranking.releaseCaches()
    super.afterAll()
  }

  test("fixed-point log2 stays within 1 ulp of exact log2 across the " +
      "(N, df) grid the idf ever sees") {
    for (n <- Seq(2L, 10L, 499L, 5000L, 1000000L);
         df <- Seq(1L, 2L, n / 2 + 1, n - 1, n).filter(_ >= 1).distinct) {
      val p = BigInt(2 * n + 2); val q = BigInt(2 * df + 1)
      val fp = Ranking.log2FixedRef(p, q, 8)
      val exact = math.log(p.toDouble / q.toDouble) / math.log(2.0) * 256.0
      assert(math.abs(fp - exact) <= 1.0,
        s"N=$n df=$df: fp=$fp exact=$exact")
    }
  }

  /** Pure-Scala replay of the engine's quantized BM25 (the spec
    * oracle: same integer formula, independent implementation). */
  private def refScores(docs: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val withTok = toks.filter(_._2.nonEmpty)
    val n = withTok.size.toLong
    val a = withTok.map(_._2.size.toLong).sum
    val df = terms.map(t =>
      t -> withTok.count(_._2.contains(t)).toLong).toMap
    val idf = df.collect { case (t, d) if d > 0 =>
      t -> Ranking.log2FixedRef(BigInt(2 * n + 2), BigInt(2 * d + 1), 8) }
    withTok.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val parts = terms.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) None
        else Some(idf(t) * 22 * a * tf /
          (10 * a * tf + 3 * a + 9 * dl * n))
      }
      if (parts.isEmpty) None
      else Some(id -> (parts.sum, parts.size.toLong))
    }.toMap
  }

  private val corpus = Seq(
    (1L, "join hash join merge the table"),
    (2L, "dup dup row scan"),
    (3L, "vector scan filter group"),
    (4L, "the a big data table"),          // no query term
    (5L, "dup hash vector join"),
    (6L, "join join join join join join"), // tf saturation
    (7L, "hash"))

  private val terms = Seq("dup", "hash", "join", "vector")

  test("engine scores == independent integer replay, rank order " +
      "(score desc, doc_id) and matched counts exact") {
    val out = Ranking.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, k = 10)
      .orderBy("rank")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val ref = refScores(corpus, terms)
    val expected = ref.toSeq
      .sortBy { case (id, (s, _)) => (-s, id) }
      .zipWithIndex
      .map { case ((id, (s, m)), i) => (i + 1, id, s, m) }
    assert(out == expected)
    // doc 4 has no query term: absent
    assert(!out.exists(_._2 == 4L))
  }

  test("the rare term dominates common ones (idf ordering) and tf " +
      "saturates (six joins cannot beat one dup)") {
    val ref = refScores(corpus, terms)
    assert(ref(2L)._1 > ref(6L)._1,
      "two dups must outscore six joins")
    assert(ref(5L)._1 > ref(1L)._1,
      "dup+hash+vector+join must outscore join-heavy doc")
  }

  test("k bounds the output and ties break by doc_id") {
    val tied = Seq((10L, "hash"), (11L, "hash"), (12L, "hash"))
    val out = Ranking.bm25TopK(tied.toDF("doc_id", "text"),
        "doc_id", "text", Seq("hash"), k = 2)
      .orderBy("rank")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(10L, 11L))
    assert(out.map(_._1) == Seq(1, 2))
    assert(out.map(_._3).distinct.size == 1, "identical docs tie")
  }
}
