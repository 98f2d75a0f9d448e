package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis
import graft.functions.RollingHashExpr

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  test("all text ops are null-safe: null text behaves as empty string") {
    import spark.implicits._
    import graft.operators.TextAnalysis._
    val df = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val got = df.select($"doc_id", tokenCount($"text").as("tc"),
        bpeTokenCount($"text").as("bc"), punctCount($"text").as("pc"),
        distinctTokenCount($"text").as("dc"), languageId($"text").as("lid"),
        qualityScore($"text").as("q"), fingerprintMd5($"text").as("fp"),
        rollingHash($"text").as("rh"))
      .collect()
    val Array(nullRow, emptyRow) = got.sortBy(_.getLong(0))
    // null and "" produce IDENTICAL, non-null outputs
    assert((1 until nullRow.length).forall(i =>
      !nullRow.isNullAt(i) && nullRow.get(i) == emptyRow.get(i)))
    assert(nullRow.getString(5) == "und") // languageId
    assert(nullRow.getLong(8) == 0L)      // rollingHash("") == 0
  }
  import spark.implicits._

  def one(text: String): org.apache.spark.sql.DataFrame =
    Seq((1L, text)).toDF("doc_id", "text")

  test("language ID identifies real multilingual samples") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der hund ist nicht zu hause und die katze auch nicht", "de"),
      ("el perro no es un gato y se fue por la calle", "es"),
      ("le chien est dans la maison pour une heure", "fr"),
      ("这是一个中文句子", "zh"),
      ("zzz qqq xxx", "und"))
    samples.foreach { case (text, expected) =>
      val got = one(text).select(TextAnalysis.languageId(col("text")))
        .as[String].head()
      assert(got == expected, s"text='$text'")
    }
  }

  test("rolling hash matches direct fold and codegen path") {
    val s = "hello world"
    val expected = "hello world".codePoints().toArray.foldLeft(0L)(
      (acc, cp) => (acc * 31 + cp) % 1000000007L)
    assert(RollingHashExpr.hash(s, 31, 1000000007L) == expected)
    val viaSpark = one(s).select(TextAnalysis.rollingHash(col("text")))
      .as[Long].head()
    assert(viaSpark == expected)
    // non-ASCII codepoints (surrogate pair) hash without splitting
    assert(RollingHashExpr.hash("a😀b", 31, 1000000007L) ==
      Seq(97L, 0x1F600L, 98L).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
  }

  test("fingerprint is invariant to case, punctuation and spacing") {
    val a = one("Hello,   World!").select(TextAnalysis.fingerprintMd5(col("text"))).as[String].head()
    val b = one("hello world").select(TextAnalysis.fingerprintMd5(col("text"))).as[String].head()
    val c = one("hello there").select(TextAnalysis.fingerprintMd5(col("text"))).as[String].head()
    assert(a == b)
    assert(a != c)
  }

  test("quality score stays in [0,1] and rewards natural text") {
    val natural = "the quick brown fox jumps over the lazy dog and runs to the hills"
    val junk = "@@@ ### $$$ %%% ^^^ &&& *** ((( )))"
    val q = Seq((1L, natural), (2L, junk)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("token counts: whitespace vs BPE-ish") {
    val df = one("don't stop: 42 works!")
    val (tok, bpe, punct) = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeTokenCount(col("text")),
      TextAnalysis.punctCount(col("text"))).as[(Int, Int, Int)].head()
    assert(tok == 4)
    // don | ' | t | stop | : | 42 | works | !
    assert(bpe == 8)
    assert(punct == 3)
  }
}
