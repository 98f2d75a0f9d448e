package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Distributions, Ranking}

class DistributionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  override def afterAll(): Unit = {
    Distributions.releaseCaches()
    Ranking.releaseCaches()
    super.afterAll()
  }

  // even ids = split A (reference), odd = split B (candidate)
  private val corpus = Seq(
    (2L, "the cat sat on the mat"),
    (4L, "the dog sat on the log"),
    (6L, "cats and dogs and cats"),
    (1L, "the zebra zebra zebra ran"),   // drift: zebra unseen in A
    (3L, "the cat sat"),                  // in-distribution
    (5L, "qq ww qq ww qq"))               // fully out-of-vocab for A

  /** Signed fixed-point log2 of num/den via the shared magnitude
    * chain (the engine's exact contract). */
  private def slog2(num: BigInt, den: BigInt): Long =
    if (num >= den) Ranking.log2FixedRef(num, den, 8)
    else -Ranking.log2FixedRef(den, num, 8)

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("klDriftTopK == independent integer replay (counts, signed " +
      "log, contributions, both global KLs)") {
    val all = corpus.flatMap { case (id, t) =>
      toks(t).map(tok => (id % 2 == 0, tok)) }
    val vocab = all.map(_._2).distinct.sorted
    val cA = vocab.map(v => v -> all.count(x => x._1 && x._2 == v).toLong).toMap
    val cB = vocab.map(v => v -> all.count(x => !x._1 && x._2 == v).toLong).toMap
    val (caT, cbT, v) = (cA.values.sum, cB.values.sum, vocab.size.toLong)
    val rows = vocab.map { t =>
      val num = BigInt(cA(t) + 1) * (cbT + v)
      val den = BigInt(cB(t) + 1) * (caT + v)
      val s = slog2(num, den)
      (t, cA(t), cB(t), s, (cA(t) + 1) * s, (cB(t) + 1) * -s)
    }
    val sAb = rows.map(_._5).sum; val sBa = rows.map(_._6).sum
    def safeDiv(s: Long, d: Long): Long =
      if (s >= 0) (1000 * s) / d else -((1000 * -s) / d)
    val klAb = safeDiv(sAb, (caT + v) * 256)
    val klBa = safeDiv(sBa, (cbT + v) * 256)
    val expected = rows.sortBy { case (t, _, _, _, w, _) => (-w, t) }
      .take(20).zipWithIndex
      .map { case ((t, a, b, s, w, _), i) =>
        (i + 1, t, a, b, s, w, klAb, klBa) }
    val out = Distributions.klDriftTopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = 20)
      .orderBy("rank")
      .as[(Int, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == expected)
    // drift direction: both KLs positive, zebra/qq/ww lead the
    // B-heavy side so the A-attribution winners are A-only tokens
    assert(klAb > 0 && klBa > 0)
    assert(out.head._3 > 0 && out.head._4 == 0,
      s"top KL(A||B) contributor must be A-heavy: ${out.head}")
  }

  test("unigramPerplexity == replay; OOV-heavy doc costs the most " +
      "bits, in-distribution doc the least") {
    val all = corpus.flatMap { case (id, t) =>
      toks(t).map(tok => (id, id % 2 == 0, tok)) }
    val vocab = all.map(_._3).distinct
    val cA = vocab.map(v =>
      v -> all.count(x => x._2 && x._3 == v).toLong).toMap
    val (caT, v) = (cA.values.sum, vocab.size.toLong)
    val nll = vocab.map(t =>
      t -> Ranking.log2FixedRef(BigInt(caT + v), BigInt(cA(t) + 1), 8)).toMap
    val expected = corpus.collect { case (id, t) if id % 2 == 1 =>
      val tk = toks(t)
      val s = tk.map(nll).sum
      (id, tk.size.toLong, s, 1000 * s / (256 * tk.size))
    }.sortBy(_._1)
    val out = Distributions.unigramPerplexity(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == expected)
    val bits = out.map(r => r._1 -> r._4).toMap
    assert(bits(5L) > bits(1L) && bits(1L) > bits(3L),
      s"quality ordering violated: $bits")
  }

  test("withLog2Fixed handles the p == q and power-of-two edges " +
      "(zero and exact-integer logs)") {
    val df = Seq((7L, 7L), (8L, 1L), (1024L, 4L), (3L, 2L))
      .toDF("p", "q")
    val out = Ranking.withLog2Fixed(df, "p", "q", "l2", 8)
      .select("p", "q", "l2").as[(Long, Long, Long)]
      .collect().map { case (p, q, l) => ((p, q), l) }.toMap
    assert(out((7L, 7L)) == 0L)
    assert(out((8L, 1L)) == 3L * 256)
    assert(out((1024L, 4L)) == 8L * 256)
    assert(out((3L, 2L)) ==
      Ranking.log2FixedRef(BigInt(3), BigInt(2), 8))
  }
}
