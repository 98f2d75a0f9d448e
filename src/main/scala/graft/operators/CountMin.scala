package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation — the fixed-size, mergeable
  * answer to "how often does token X appear in 100 TB of text". The
  * exact answer shuffles the corpus' full vocabulary (|V| groups —
  * q_top_tokens' plan); the sketch is d×w integer counters built in
  * ONE partial-aggregated pass whose exchange carries at most d·w
  * groups regardless of corpus size, merges across
  * partitions/days/shards by element-wise addition, and answers point
  * queries from the tiny table alone. Estimates are ONE-SIDED
  * (est >= true count, the Cormode-Muthukrishnan guarantee) with
  * error <= ε·N at probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * DETERMINISTIC by construction (the SQ8/HyperBall trick — quantize
  * the algorithm, keep the gate hash-exact): row hashes are the
  * portable rolling hash composed with fixed affine maps
  * `((h·a_i + b_i) mod P) mod w` — the same pairwise-independent
  * family the MinHash signatures use, replayable in ANY engine. No
  * overflow: h < P ≈ 1e9, a_i < 600 → products < 2^40.
  *
  * (Beyond-reference capability; the sketch side of the same design
  * family as Profile's HLL/GK — mergeable partials over exact
  * holistic aggregation.)
  */
object CountMin {

  /** Sketch depth (hash rows) and width (counters per row). */
  val Depth = 4
  val Width = 512L

  /** Fixed affine coefficients per row — small primes; the family the
    * oracle replays verbatim. */
  val RowCoeffs: Seq[(Long, Long)] =
    Seq((31L, 7L), (131L, 13L), (257L, 17L), (523L, 29L))

  private def P: Long = Dedup.P

  /** Counter index of `h` (a rolling hash) in sketch row `i`. */
  def rowIndex(h: Column, i: Int): Column = {
    val (a, b) = RowCoeffs(i)
    pmod(pmod(h * lit(a) + lit(b), lit(P)), lit(Width))
  }

  /** Build the d×w sketch from a token stream (column `token`, one
    * row per occurrence). ONE pass, one exchange of <= d·w groups —
    * the fixed-size aggregate that replaces a vocabulary-wide
    * shuffle. Output: (row, idx, c). */
  def sketch(tokens: DataFrame): DataFrame = {
    val h = graft.operators.TextAnalysis.rollingHash(col("token"))
    tokens
      .select(explode(array((0 until Depth).map(i =>
        struct(lit(i).as("row"), rowIndex(h, i).as("idx"))): _*)).as("e"))
      .groupBy(col("e.row").as("row"), col("e.idx").as("idx"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate each candidate token against the sketch:
    * est = min over rows of the counter the token hashes to. The
    * sketch is broadcast (d·w rows by construction — never
    * data-proportional). */
  def estimate(sk: DataFrame, candidates: DataFrame): DataFrame = {
    val h = graft.operators.TextAnalysis.rollingHash(col("token"))
    val withIdx = candidates.select(
      (candidates.columns.map(col) :+
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row"), rowIndex(h, i).as("idx"))): _*)).as("e")): _*)
    withIdx
      .join(broadcast(sk),
        col("e.row") === sk("row") && col("e.idx") === sk("idx"))
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(col("c")).as("est"))
  }

  /** Gate face: heavy hitters with exact-vs-sketch reconciliation.
    * The exact top-20 tokens (the q_top_tokens plan) are point-queried
    * against the one-pass sketch; the one-sided CMS guarantee
    * (est >= exact for EVERY candidate) is require-enforced, and both
    * counts are hash-gated — the estimates are deterministic, so
    * "approximate" still means "bit-reproducible". */
  def heavyHittersFace(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .localCheckpoint(true) // feeds BOTH the exact top and the sketch
    try {
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
      val out = estimate(sketch(toks), exact)
        .orderBy(col("n").desc, col("token"))
        .localCheckpoint(true)
      val bad = out.filter(col("est") < col("n")).count()
      require(bad == 0,
        s"$bad candidates estimate BELOW their exact count — the " +
          "one-sided CMS guarantee is broken")
      out
    } finally GraphOps.releaseCheckpointedFrame(toks)
  }
}
