package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval — the lexical scoring face of the retrieval
  * family: [[Indexing.invertedIndex]] builds the postings,
  * [[Indexing.phraseSearch]] answers exact-match, and
  * [[Indexing.sparseCosineTopK]] scores whole-corpus similarity; this
  * operator scores an ad-hoc TERM QUERY against the corpus with the
  * Okapi BM25 function (Robertson et al., TREC-3), the default
  * ranking in every production search stack (Lucene/Elasticsearch)
  * and the sparse-retrieval baseline of RAG pipelines. Beyond-parity:
  * the reference has no text processing at all.
  *
  * Exactness — the quantize-the-algorithm discipline, twice:
  *
  *  1. idf. Lucene-BM25 idf(t) = ln(1 + (N−df+0.5)/(df+0.5))
  *     = ln((2N+2)/(2df+1)). ln is not a correctly-rounded IEEE op
  *     (engines' libm disagree in the last ulp), so the engine
  *     computes idf in FIXED POINT: `idf_q = floor(2^F · log2(p/q))`
  *     for integers p = 2N+2, q = 2df+1, by the classic
  *     square-and-renormalize algorithm — integer part from bit
  *     lengths, then F rounds of (renormalize to 31 bits by a shift
  *     of BOTH numerator and denominator; square both; emit a 1 and
  *     halve if the ratio crossed 2). Every step is integer
  *     arithmetic — shifts, multiplies, compares — so DuckDB replays
  *     it bit-for-bit; the deterministic renormalizing truncation
  *     costs ≤1 ulp at F=8 (spec-pinned against exact BigInt).
  *     log2 vs ln is a uniform positive scale on all idfs —
  *     BM25's ranking is invariant under it (the α_m-style
  *     presentation choice).
  *
  *  2. tf saturation. With k1 = 6/5 and b = 3/4 (the standard 1.2 /
  *     0.75), multiplying numerator and denominator of
  *     tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) by 10A (A = Σdl, so
  *     avgdl = A/N) clears every fraction:
  *     `term_score = idf_q·22·A·tf div (10·A·tf + 3·A + 9·dl·N)` —
  *     one truncating BIGINT division per (doc, term), summed
  *     order-independently.
  *
  * Overflow headroom: the numerator bound is idf_q·22·A·tf_max;
  * with idf_q ≤ 2^F·log2(2N) this holds to A·tf ≈ 10^14 at F=8 —
  * beyond that, replace exact A by truncated avgdl_milli = 10^3·A
  * div N (same plan, one documented extra quantization).
  *
  * Shape at 100 TB: tokenize → the query-term FILTER runs map-side
  * inside the explode (only the |Q| query terms' postings reach the
  * (doc, term) exchange — the phraseSearch discipline); dl is one
  * map-side-combined exchange on doc; N/A ride a broadcast
  * single-row aggregate; df → idf runs on a |Q|-row frame (the
  * 8-step fixed-point chain is |Q| rows of integer ops, broadcast
  * back); scoring joins tf⋈dl co-partitioned on doc and sums with
  * map-side combine; the global top-k is TakeOrderedAndProject
  * (never a full sort). The final row_number window ranks k rows.
  */
object Ranking extends CachePinning {

  /** Exact BigInt reference of the fixed-point log2 — the spec
    * oracle for the columnar chain below (never used in a plan). */
  def log2FixedRef(p: BigInt, q: BigInt, fracBits: Int): Long = {
    require(p >= q && q > 0)
    val e0 = p.bitLength - q.bitLength
    val e = if (p < (q << e0)) e0 - 1 else e0
    var pp = p; var qq = q << e; var frac = 0L
    for (_ <- 0 until fracBits) {
      val sh = math.max(0, pp.bitLength - 31)
      pp >>= sh; qq >>= sh
      pp *= pp; qq *= qq
      if (pp >= qq * 2) { frac = frac * 2 + 1; qq *= 2 }
      else frac *= 2
    }
    e.toLong * (1L << fracBits) + frac
  }

  /** Columnar form of [[log2FixedRef]]: appends `out` =
    * floor(2^fracBits · log2(pCol/qCol)), requiring pCol ≥ qCol ≥ 1
    * rowwise. The chain is fracBits rounds of integer shifts,
    * multiplies and compares — every step codegen'd, no floating
    * point anywhere — so DuckDB replays it bit-for-bit as a
    * recursive CTE. Shared by BM25 idf, KL-drift, and unigram
    * perplexity (Distributions). Intermediate `_l2_*` columns are
    * dropped; callers must not use that prefix. */
  def withLog2Fixed(df: DataFrame, pCol: String, qCol: String,
                    out: String, fracBits: Int): DataFrame = {
    require(fracBits >= 1 && fracBits <= 16, s"fracBits 1..16: $fracBits")
    // Rowwise contract enforced loudly: a violating row (p < q or
    // q < 1) would otherwise yield a negative _l2_e fed to shiftleft
    // (Spark shifts by e & 63) — silent garbage. assert_true returns
    // NULL when the contract holds, so the `+ ifnull(..., 0)` keeps
    // the guard inside a load-bearing expression (a free-standing
    // guard column would be pruned by ColumnPruning).
    var d = df
      .withColumn("_l2_e0",
        expr(s"length(bin($pCol)) - length(bin($qCol)) + " +
          s"ifnull(cast(assert_true($pCol >= $qCol AND $qCol >= 1, " +
          s"concat('withLog2Fixed: need $pCol >= $qCol >= 1; got p=', " +
          s"$pCol, ' q=', $qCol)) as int), 0)"))
      .withColumn("_l2_e", expr(s"CASE WHEN $pCol < " +
        s"shiftleft($qCol, _l2_e0) THEN _l2_e0 - 1 ELSE _l2_e0 END"))
      .withColumn("_l2_pp", col(pCol).cast("long"))
      .withColumn("_l2_qq", expr(s"shiftleft($qCol, _l2_e)"))
      .withColumn("_l2_frac", lit(0L))
    for (_ <- 0 until fracBits) {
      d = d
        .withColumn("_l2_sh",
          expr("greatest(length(bin(_l2_pp)) - 31, 0)"))
        .withColumn("_l2_ps",
          expr("shiftright(_l2_pp, _l2_sh) * shiftright(_l2_pp, _l2_sh)"))
        .withColumn("_l2_qs",
          expr("shiftright(_l2_qq, _l2_sh) * shiftright(_l2_qq, _l2_sh)"))
        .withColumn("_l2_pp", col("_l2_ps"))
        .withColumn("_l2_frac", expr(
          "_l2_frac * 2 + CASE WHEN _l2_ps >= 2 * _l2_qs THEN 1 ELSE 0 END"))
        .withColumn("_l2_qq",
          expr("CASE WHEN _l2_ps >= 2 * _l2_qs THEN 2 * _l2_qs ELSE _l2_qs END"))
    }
    d.withColumn(out, expr(s"_l2_e * ${1L << fracBits} + _l2_frac"))
      .drop("_l2_e0", "_l2_e", "_l2_pp", "_l2_qq", "_l2_frac",
        "_l2_sh", "_l2_ps", "_l2_qs")
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               fracBits: Int = 8): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 64,
      s"need 1..64 query terms, got ${queryTerms.size}")
    require(k > 0 && fracBits >= 1 && fracBits <= 16,
      s"need k > 0, fracBits in 1..16; got $k, $fracBits")
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    // pinned: dl feeds the N/A totals AND the scoring join; tf feeds
    // the df aggregate AND the scoring join — without the pins each
    // consumer re-runs the corpus tokenize scan (4 scans of the
    // 100 TB input instead of 2: one for dl, one for the term-
    // filtered tf). Callers release via releaseCaches.
    val dl = pin(tok.groupBy("doc_id").agg(count(lit(1)).as("dl")))
    val gl = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("a"))
    val tf = pin(tok.filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("tok").as("term"))
      .agg(count(lit(1)).as("tf")))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // fixed-point log2((2N+2)/(2df+1)) on the |Q|-row term frame
    val idf = withLog2Fixed(
      dfq.crossJoin(broadcast(gl))
        .withColumn("p", expr("2 * n + 2"))
        .withColumn("q", expr("2 * df + 1")),
      "p", "q", "idf", fracBits)
    val idfT = idf.select(col("term"), col("idf"))
    val scored = tf.join(dl, "doc_id")
      .crossJoin(broadcast(gl))
      .join(broadcast(idfT), "term")
      .groupBy("doc_id")
      .agg(sum(expr(
          "idf * 22 * a * tf div (10 * a * tf + 3 * a + 9 * dl * n)"))
          .as("score"),
        count(lit(1)).as("matched"))
    // global top-k: TakeOrderedAndProject, then rank the k survivors
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("rank", "doc_id", "score", "matched")
  }
}
