package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DotProductLongExpr, TopKBySim}
import graft.operators.TextAnalysis.rollingHash

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the correctness baseline, and an
  * IVF-partitioned (inverted-file) variant as the scale path.
  *
  * Scale design (the 100 TB story):
  *  - brute force is O(n²) pairs with the small side broadcast — only
  *    viable for bounded candidate sets; it exists as the baseline and
  *    as the verifier inside block/cluster-local searches.
  *  - IVF: assign every vector to its nearest centroid (a broadcast
  *    map-side join — the centroid set is FIXED-k by construction,
  *    [[Similarity.HashSampledCentroids]], so assignment is O(n·k) and
  *    the broadcast stays small no matter how the corpus grows), then
  *    search only within the cluster (a shuffle on cluster id, each
  *    bucket independent). At a 1000-executor scale this is the
  *    difference between n² network pairs and one partitioned pass.
  *    Recall is tunable via the centroid budget / probe count; the
  *    spec measures it against the brute-force baseline.
  *
  * Oracle-exactness: all similarity math used in driver-checked queries
  * runs on integer-quantized embeddings (`round(x*1000)` as long) —
  * integer dot products are exact and order-free, so Spark and DuckDB
  * agree bit-for-bit; the final cosine is exact-int division and
  * IEEE sqrt, deterministic in both engines. [[cosineSim]] offers the
  * raw double variant for library use (spec checks quantized ≈ raw).
  *
  * Caching note: each operator pins its quantized projection for the
  * duration of the returned query (it feeds multiple join sides) — as
  * an eager LOCAL CHECKPOINT since r20 (raw row blocks skip the
  * columnar encode/decode the old persist paid per consumer read;
  * measured across the ANN family, e.g. q_ann_trained_recall process
  * CPU 45 → 10 s). Faces composing SEVERAL operators over one
  * embedding table share a single [[quantizedBase]] handle through
  * the `*OnBase` entry points (checkpoints materialize per handle —
  * unlike persist they are NOT deduplicated by plan equality).
  * Long-lived applications issuing many calls should release pins per
  * query via [[CachePinning.releaseCaches]] after materializing the
  * result (the Bench/Verify harnesses sweep the whole session cache
  * instead).
  */
object Similarity extends CachePinning {

  /** Quantization scale: 3 decimal digits of each embedding value. */
  val QuantScale = 1000

  /** Default IVF centroid budget: |centroids| is FIXED at k regardless
    * of corpus size (the r9 stride model — `vec_id % 25 == 0` — grew
    * the centroid set linearly with the corpus, making broadcast
    * assignment O(n²/stride); with a fixed k it is O(n·k) by
    * construction). Named so DuckDB oracles interpolate the same
    * constant the operators default to. */
  val DefaultNumCentroids = 100

  /** Fixed Lloyd-step budget for the trained-IVF faces
    * ([[trainIvfCentroids]]) — named so the DuckDB oracle unrolls the
    * same number of steps. */
  val IvfTrainSteps = 2

  /** How IVF centroids ("training" seeds) are chosen. */
  sealed trait CentroidSeeding

  /** Production seeding: the k vectors with the smallest
    * `(rollingHash(vec_id), vec_id)` — a deterministic hash-order
    * sample (uniform over the id space, no coordination), selected by
    * distributed take-ordered: O(n log k) map-side partial top-k, only
    * k rows ever reach the driver. The DuckDB oracle replays the same
    * rolling hash, so queries seeded this way stay hash-exact. */
  final case class HashSampledCentroids(k: Int = DefaultNumCentroids)
    extends CentroidSeeding

  /** Test fixture: exact seed ids. Fails loudly inside the main job if
    * none of the ids carries a nonzero quantized vector (the 0%-recall
    * trap); hash-sampled seeding cannot hit that trap — a nonempty
    * input always yields centroids. */
  final case class ExplicitCentroids(ids: Seq[Long]) extends CentroidSeeding

  /** Synthetic centroids from a training pass ([[trainIvfCentroids]]):
    * a bounded frame (cid LONG, cqe ARRAY<LONG>) — the centroid is a
    * POINT in quantized space, not a member vector. All-zero centroids
    * are dropped (cosine undefined), mirroring the oracle's filter. */
  final case class ProvidedCentroids(cents: DataFrame) extends CentroidSeeding

  /** Integer-quantize an array<float> embedding to array<long>. Null
    * ELEMENTS quantize to 0 (a missing coordinate contributes nothing
    * to dot products) — left as null they would NPE or silently read
    * as 0 depending on the physical array layout, i.e. plan-dependent
    * results. */
  def quantize(emb: Column): Column =
    transform(emb, x =>
      coalesce(round(x.cast("double") * QuantScale).cast("long"), lit(0L)))

  /** Exact integer dot product of two array<long> vectors — a native
    * codegen'd expression ([[DotProductLongExpr]]); the equivalent
    * `aggregate(zip_with(...))` interprets its lambdas per element per
    * pair and was the brute-force top-k bottleneck. */
  def dotLong(a: Column, b: Column): Column = DotProductLongExpr.dot_long(a, b)

  /** Raw double cosine similarity (library use; not oracle-compared). */
  def cosineSim(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(ad, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(bd, lit(0.0), (acc, v) => acc + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Quantized cosine from integer dot and squared norms — bit-exact
    * across engines (int division + IEEE sqrt). */
  private def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** (id, qe, nn): quantized embedding + its squared norm. Vectors
    * that quantize to all-zero (nn = 0) are dropped — cosine is
    * undefined for them and a NaN sim would rank differently across
    * engines; the oracle SQL mirrors the same `nn > 0` filter. */
  private def quantized(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), quantize(col(embCol)).as("qe"))
      .withColumn("nn", dotLong(col("qe"), col("qe")))
      .filter(col("nn") > 0)

  /** Explode a best-first `top_k_by_sim` array into ranked rows. */
  private def explodeRanked(grouped: DataFrame): DataFrame =
    grouped.select(col("vec_id"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.neighbor_id").as("neighbor_id"), col("nb.sim").as("sim"))

  /** Brute-force cosine top-k neighbours per vector. O(n²) — baseline
    * and bounded-block searcher. Output: (vec_id, rank, neighbor_id,
    * sim), rank 1..k by (sim desc, neighbor_id asc) — deterministic.
    *
    * Ranking is the bounded [[TopKBySim]] aggregate, not a window:
    * partial aggregation collapses the pair stream to k rows per key
    * map-side instead of shuffling + sorting every candidate pair. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     k: Int = 5): DataFrame =
    topKOverBase(pinCkpt(quantized(df, idCol, embCol)), k)

  /** The quantized (vec_id, qe, nn) base pinned as an eager LOCAL
    * CHECKPOINT — for faces that compose several searchers/evals over
    * the SAME embeddings (r20). Passing this one handle to the
    * `*OnBase` entry points replaces the per-operator persist pins
    * those compositions relied on CacheManager plan-equality dedup to
    * share, and the checkpoint's raw row blocks skip the columnar
    * encode + per-consumer-read decode the persist paid (the corpus
    * checkpoint-pin rationale — array columns are the expensive
    * columnar case). Same release contract as every pin: the caller
    * materializes the composed query, then [[releaseCaches]]. */
  def quantizedBase(df: DataFrame, idCol: String, embCol: String): DataFrame =
    pinCkpt(quantized(df, idCol, embCol))

  /** [[bruteForceTopK]] over a shared [[quantizedBase]]. */
  def bruteForceTopKOnBase(base: DataFrame, k: Int = 5): DataFrame =
    topKOverBase(base, k)

  /** [[ivfTopK]] over a shared [[quantizedBase]]. */
  def ivfTopKOnBase(base: DataFrame, k: Int = 5,
                    seeding: CentroidSeeding = HashSampledCentroids(),
                    nprobe: Int = 3): DataFrame =
    ivfTopKOverBase(base, k, seeding, nprobe)

  /** [[trainIvfCentroids]] over a shared [[quantizedBase]]. */
  def trainIvfCentroidsOnBase(base: DataFrame, steps: Int = IvfTrainSteps,
                              seeding: CentroidSeeding =
                                HashSampledCentroids()): DataFrame =
    trainOverBase(base, steps, seeding)

  /** All-pairs cosine + bounded top-k over a prepared (vec_id, qe, nn)
    * base — shared by the exact and int8-quantized searchers. */
  private def topKOverBase(base: DataFrame, k: Int): DataFrame = {
    val a = base.select(col("vec_id"), col("qe").as("qe_a"), col("nn").as("nn_a"))
    val b = base.select(col("vec_id").as("neighbor_id"), col("qe").as("qe_b"),
      col("nn").as("nn_b"))
    val pairs = a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineQ(dotLong(col("qe_a"), col("qe_b")),
        col("nn_a"), col("nn_b")))
    explodeRanked(pairs.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(col("sim"), col("neighbor_id"), k).as("tk")))
  }

  /** Product-quantization (PQ) defaults: m subvectors × ksub centroids
    * per sub-codebook. Named so the DuckDB oracle interpolates the
    * same constants. */
  val PqSubvectors = 8
  val PqSubCentroids = 16

  /** Product-quantization ANN (Jégou et al. 2011, the FAISS PQ shape)
    * — the final rung of the compression ladder (float32 → SQ8 →
    * PQ): each vector's m subvectors are replaced by 4-bit codebook
    * indices, so a 64-dim float32 vector (256 B) becomes m·log2(ksub)
    * = 32 BITS of codes. At 100 TB that is the difference between an
    * embedding index that lives in executor memory and one that
    * cannot exist; search composes with IVF exactly like SQ8 does
    * (both consume a coded base).
    *
    * Construction, all hash-exact by the quantize-the-algorithm
    * discipline:
    *  - codebooks: the ksub hash-order sample vectors (the
    *    [[HashSampledCentroids]] seeding — fixed size, replayable),
    *    each contributing its s-th slice to sub-codebook s;
    *  - encoding: code_s(v) = argmin over the sub-codebook of the
    *    exact integer L2² distance (tie → lowest index) — computed as
    *    nn_v + nn_c − 2·dot via the native codegen'd dot product;
    *  - search: ASYMMETRIC distance (ADC): the query keeps full
    *    quantized precision; d²(q, c) ≈ Σ_s LUT_q[s][code_s(c)] where
    *    LUT_q is the query's 128-entry distance table — per pair the
    *    lookup is m codegen'd element_at calls, no per-pair vector
    *    arithmetic at all (the whole point: candidate vectors are
    *    never touched, only their 32-bit codes).
    *
    * PQ is natively an L2 structure, so this face ranks by integer
    * L2² distance (ascending, neighbor id tie-break) — every value a
    * BIGINT, the oracle replays bit-exactly. Output: (vec_id, rank,
    * neighbor_id, dist). */
  def pqTopK(df: DataFrame, idCol: String, embCol: String, dim: Int,
             k: Int = 5, m: Int = PqSubvectors,
             ksub: Int = PqSubCentroids): DataFrame = {
    val (_, pairs) = pqAdcPairs(df, idCol, embCol, dim, m, ksub)
    explodeRanked(pairs.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(-col("dist").cast("double"),
        col("neighbor_id"), k).as("tk")))
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).cast("long").as("dist"))
  }

  /** Default PQ re-rank shortlist size (see [[pqTopKReranked]]). */
  val PqShortlist = 50

  /** PQ + exact re-rank — the PRODUCTION composition: the 32-bit-code
    * ADC scan produces a `shortlist` of candidates per query, then
    * ONLY those candidates' full quantized vectors are touched for an
    * exact integer L2² re-rank to top-k. Per query the full-precision
    * work drops from n vectors to `shortlist` — the memory/IO shape
    * that makes PQ usable as a first-stage filter at 100 TB, and the
    * standard answer to raw ADC's recall loss (measured on the
    * shipped embeddings: recall@5 0.14 raw → 0.56 re-ranked at
    * shortlist 50; the codes are deliberately untrained hash-seeds,
    * the worst case). Ranking: exact d² asc, neighbor id tie-break —
    * integers throughout, oracle-replayable. */
  def pqTopKReranked(df: DataFrame, idCol: String, embCol: String,
                     dim: Int, k: Int = 5, shortlist: Int = PqShortlist,
                     m: Int = PqSubvectors,
                     ksub: Int = PqSubCentroids): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val (base, pairs) = pqAdcPairs(df, idCol, embCol, dim, m, ksub)
    val short = explodeRanked(pairs.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(-col("dist").cast("double"),
        col("neighbor_id"), shortlist).as("tk")))
      .select(col("vec_id"), col("neighbor_id"))
    val rer = short
      .join(base.select(col("vec_id"), col("qe").as("qe_q"),
        col("nn").as("nn_q")), "vec_id")
      .join(base.select(col("vec_id").as("neighbor_id"),
        col("qe").as("qe_c"), col("nn").as("nn_c")), "neighbor_id")
      .withColumn("d2", col("nn_q") + col("nn_c") -
        lit(2L) * dotLong(col("qe_q"), col("qe_c")))
    explodeRanked(rer.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(-col("d2").cast("double"),
        col("neighbor_id"), k).as("tk")))
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).cast("long").as("dist"))
  }

  /** IVF-PQ — the two scale levers composed the way FAISS's IVFPQ
    * does: the COARSE stage assigns every vector to its nearest
    * centroid in full quantized precision and queries probe their
    * `nprobe` nearest clusters (exactly [[ivfTopK]]'s structure); the
    * FINE stage scores only the probed clusters' candidates by PQ
    * asymmetric distance — per pair m LUT lookups against 32-bit
    * codes, no vector arithmetic. At 100 TB: IVF prunes the candidate
    * set to nprobe clusters, PQ shrinks every candidate touched to 32
    * bits — the index that fits where even SQ8 doesn't. (No residual
    * encoding: codes quantize the raw vectors, not centroid
    * residuals — documented simplification; residuals would break
    * the shared-codebook determinism the oracle replays.)
    *
    * Ranking: integer ADC L2² asc, neighbor id tie-break — the
    * [[pqTopK]] contract restricted to IVF candidates; hash-exact by
    * the same construction. */
  def ivfPqTopK(df: DataFrame, idCol: String, embCol: String, dim: Int,
                k: Int = 5, m: Int = PqSubvectors,
                ksub: Int = PqSubCentroids,
                seeding: CentroidSeeding = HashSampledCentroids(),
                nprobe: Int = 3): DataFrame = {
    val (base, codes, luts) = pqCodesAndLuts(df, idCol, embCol, dim, m, ksub)
    val ranked = ivfAssignmentOverBase(base, seeding, nprobe)
    val (index, probes) = ivfIndexAndProbes(ranked)
    // candidate pairs cluster-locally: each candidate lives in ONE
    // home cluster, so a (query, candidate) pair arises at most once
    val cand = probes.select(col("cluster"), col("vec_id"))
      .join(index.select(col("cluster"), col("neighbor_id")), Seq("cluster"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    val pairs = cand.join(luts, Seq("vec_id"))
      .join(broadcast(codes.select(col("vec_id").as("neighbor_id"),
        col("codes"))), Seq("neighbor_id"))
      .withColumn("dist", adcDist(m, ksub))
    explodeRanked(pairs.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(-col("dist").cast("double"),
        col("neighbor_id"), k).as("tk")))
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).cast("long").as("dist"))
  }

  /** ADC distance for one (lut, codes) pair row: Σ_s LUT[s·ksub +
    * code_s] — m codegen'd element_at lookups. */
  private def adcDist(m: Int, ksub: Int): org.apache.spark.sql.Column =
    (0 until m).map(s =>
        element_at(col("lut"),
          (element_at(col("codes"), s + 1) + lit(s * ksub) + 1)
            .cast("int")))
      .reduce(_ + _)

  /** Shared PQ machinery: codebooks, encoding, query LUTs, and the
    * ADC pair stream — returns (pinned base, pairs-with-dist). */
  private def pqAdcPairs(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, m: Int,
                         ksub: Int): (DataFrame, DataFrame) = {
    val (base, codes, luts) = pqCodesAndLuts(df, idCol, embCol, dim, m, ksub)
    val pairs = luts.join(
        broadcast(codes.select(col("vec_id").as("neighbor_id"),
          col("codes"))),
        col("vec_id") =!= col("neighbor_id"))
      .withColumn("dist", adcDist(m, ksub))
    (base, pairs)
  }

  /** PQ codebooks/encoding/LUTs shared by the flat and IVF searchers:
    * returns (pinned quantized base, per-vector codes, per-query
    * LUTs). */
  private def pqCodesAndLuts(df: DataFrame, idCol: String, embCol: String,
                             dim: Int, m: Int,
                             ksub: Int): (DataFrame, DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim not divisible by $m subvectors")
    val sub = dim / m
    val base = pinCkpt(quantized(df, idCol, embCol))
    // declared-dim guard rides the main job (the centroid-guard
    // pattern): a vector of any OTHER length would slice garbage
    // silently
    val checked = base.filter(
      when(size(col("qe")) === dim, lit(true))
        .otherwise(raise_error(concat(lit(s"PQ declared dim $dim but vector "),
          col("vec_id").cast("string"), lit(" has "),
          size(col("qe")).cast("string"), lit(" dims")))))
    // sub-codebooks: the ksub hash-order seeds, sliced per subvector;
    // cidx = the seed's deterministic rank in the sample
    val seeds = checked
      .select(col("vec_id").as("cid"), col("qe").as("cqe"),
        rollingHash(col("cid").cast("string")).as("ch"))
      .orderBy(col("ch"), col("cid"))
      .limit(ksub)
    val cents = seeds
      .withColumn("cidx", row_number().over(
        Window.orderBy(col("ch"), col("cid"))) - 1)
      .drop("ch")
    val subCents = cents.select(col("cidx"),
      posexplode(array((0 until m).map(s =>
        slice(col("cqe"), s * sub + 1, sub)): _*)).as(Seq("s", "csub")))
    // one shared (vector, subvector, centroid) integer distance table
    // feeds BOTH the candidate encoding (argmin per (vec, s)) and the
    // query LUTs (all ksub entries per (vec, s)) — computed once
    val subVecs = checked.select(col("vec_id"),
      posexplode(array((0 until m).map(s =>
        slice(col("qe"), s * sub + 1, sub)): _*)).as(Seq("s", "vsub")))
    val d2 = pinCkpt(subVecs.join(broadcast(subCents), "s")
      .withColumn("d2", dotLong(col("vsub"), col("vsub")) +
        dotLong(col("csub"), col("csub")) -
        lit(2L) * dotLong(col("vsub"), col("csub")))
      .select(col("vec_id"), col("s"), col("cidx"), col("d2")))
    val codes = d2
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("cidx"))).as("w"))
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("s"),
        col("w.cidx").as("code")))), x => x.getField("code")).as("codes"))
    val luts = d2
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("s"), col("cidx"),
        col("d2")))), x => x.getField("d2")).as("lut"))
    // ADC consumers: query LUT rows × broadcast candidate codes (n
    // rows of 32-bit codes — the compressed index IS the broadcast),
    // m element_at lookups per pair
    (base, codes, luts)
  }

  /** Per-vector int8 scalar quantization (the FAISS-style SQ8 shape):
    * codes in [-127, 127] with per-vector scale s = max|x_i|. The
    * scale cancels in cosine, so quantized search needs no
    * dequantization — integer dot products over byte-range codes.
    * At 100 TB this is the memory-bandwidth lever: an int8 code
    * vector is 4x smaller than float32, the difference between an
    * embedding table that fits the executors' page cache and one that
    * re-reads storage every probe. Codes ride as array<long> (Spark's
    * native integral array element width for codegen'd arithmetic);
    * the VALUE RANGE is the int8 contract — a packed-byte storage
    * layer drops in without changing any result. All-zero vectors
    * (s = 0) are dropped, mirroring [[quantized]]'s nn > 0 rule; null
    * coordinates quantize to 0 for the same plan-independence reason
    * as [[quantize]]. */
  def int8Codes(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"),
        transform(col(embCol), x => x.cast("double")).as("e"))
      .withColumn("s",
        array_max(transform(col("e"), x => abs(coalesce(x, lit(0.0))))))
      .filter(col("s") > 0)
      .select(col("vec_id"), transform(col("e"),
        x => coalesce(round(x * lit(127.0) / col("s")).cast("long"), lit(0L)))
        .as("qe"))
      .withColumn("nn", dotLong(col("qe"), col("qe")))
      .filter(col("nn") > 0)

  /** Int8-quantized brute-force cosine top-k — [[bruteForceTopK]]'s
    * output contract over [[int8Codes]]. Approximate relative to the
    * full-precision ranking (the spec bounds recall against
    * [[bruteForceTopK]]); exact relative to its own definition, so the
    * DuckDB oracle replays it hash-exactly. Composes with the IVF
    * index unchanged (both paths consume a (vec_id, qe, nn) base). */
  def bruteForceTopKQ8(df: DataFrame, idCol: String, embCol: String,
                       k: Int = 5): DataFrame =
    topKOverBase(pinCkpt(int8Codes(df, idCol, embCol)), k)

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * quantized cosine ≥ threshold — the embedding-space face of the
    * dedup family (Dedup covers the token-space faces). Brute force —
    * the EXACT baseline; [[cosineNearDupsIvf]] is the cluster-local
    * scale path that never goes all-pairs. */
  def cosineNearDups(df: DataFrame, idCol: String, embCol: String,
                     threshold: Double): DataFrame = {
    val base = pinCkpt(quantized(df, idCol, embCol))
    val a = base.select(col("vec_id").as("vec_a"), col("qe").as("qe_a"),
      col("nn").as("nn_a"))
    val b = base.select(col("vec_id").as("vec_b"), col("qe").as("qe_b"),
      col("nn").as("nn_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", cosineQ(dotLong(col("qe_a"), col("qe_b")),
        col("nn_a"), col("nn_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  /** IVF approximate top-k: centroids per `seeding` (default: fixed-k
    * hash-order sample — [[HashSampledCentroids]]); every vector is
    * indexed under its nearest centroid (broadcast assign), and every
    * query probes its `nprobe` nearest clusters, searching only vectors
    * indexed there. Output schema matches [[bruteForceTopK]]; misses
    * are the recall cost of the scale path — tune recall with the
    * centroid budget and nprobe (the spec measures it against brute
    * force). */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String,
              k: Int = 5, seeding: CentroidSeeding = HashSampledCentroids(),
              nprobe: Int = 3): DataFrame =
    ivfTopKOverBase(pinCkpt(quantized(df, idCol, embCol)), k, seeding, nprobe)

  /** [[ivfTopK]] at SEVERAL probe depths over ONE shared candidate
    * pass (r20 optimization round; guide §1.2 "don't compute things
    * you throw away"): the per-(query, neighbor) similarity stream is
    * computed ONCE at max(probes) with its probe rank attached; each
    * requested depth then aggregates the `rank < p` slice. Bit-equal
    * to running [[ivfTopK]] per depth: [[TopKBySim]]'s (sim desc, id
    * asc) order is total, so the nprobe = p assignment is the
    * p-prefix of the max-probe assignment, and every vector lives in
    * exactly ONE cluster, so the candidate set at depth p is exactly
    * the rank < p slice of the max-depth pair stream. The recall-sweep
    * faces paid |probes| full assignment + score-join passes per
    * seeding; this pays one (the per-depth top-k aggregates over the
    * pinned pair stream are the only repeated work, and they are the
    * sweep's inherent output).
    *
    * @return (nprobe, top-k frame in [[bruteForceTopK]]'s schema) per
    *         requested depth, in input order; caller releases pins via
    *         [[releaseCaches]] after materializing. */
  def ivfTopKSweep(df: DataFrame, idCol: String, embCol: String,
                   k: Int = 5,
                   seeding: CentroidSeeding = HashSampledCentroids(),
                   probes: Seq[Int] = Seq(1, 3, 5)): Seq[(Int, DataFrame)] =
    ivfTopKSweepOnBase(pinCkpt(quantized(df, idCol, embCol)), k, seeding, probes)

  /** [[ivfTopKSweep]] over a shared [[quantizedBase]]. */
  def ivfTopKSweepOnBase(base: DataFrame, k: Int = 5,
                         seeding: CentroidSeeding = HashSampledCentroids(),
                         probes: Seq[Int] = Seq(1, 3, 5))
      : Seq[(Int, DataFrame)] = {
    require(probes.nonEmpty && probes.forall(_ >= 1),
      s"probe depths must be >= 1: $probes")
    val ranked = ivfAssignmentOverBase(base, seeding, probes.max)
    val index = ranked
      .select(col("vec_id").as("neighbor_id"),
        col("tk").getItem(0).getField("neighbor_id").as("cluster"),
        col("qe").as("qe_b"), col("nn").as("nn_b"))
    val probed = ranked
      .select(col("vec_id"), posexplode(col("tk")).as(Seq("pr", "probe")),
        col("qe"), col("nn"))
      .select(col("vec_id"), col("probe.neighbor_id").as("cluster"),
        col("pr"), col("qe").as("qe_a"), col("nn").as("nn_a"))
    val pairs = pinCkpt(probed.join(index, Seq("cluster"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"), col("pr"),
        cosineQ(dotLong(col("qe_a"), col("qe_b")),
          col("nn_a"), col("nn_b")).as("sim")))
    probes.map { p =>
      p -> explodeRanked(pairs.filter(col("pr") < p).groupBy(col("vec_id"))
        .agg(TopKBySim.top_k_by_sim(col("sim"), col("neighbor_id"), k)
          .as("tk")))
    }
  }

  /** IVF approximate top-k over SQ8 codes — [[ivfTopK]]'s search
    * structure on [[int8Codes]]'s base: the 100 TB configuration of
    * the similarity family, composing the two scale levers (IVF
    * prunes the candidate set to nprobe clusters; SQ8 shrinks every
    * vector touched 4x). Same fixed-k hash-order centroid seeding —
    * the seed IDS are identical to the full-precision index (the
    * hash ranks only ids), only their codes differ — so the DuckDB
    * oracle replays the whole construction hash-exactly. */
  def ivfTopKQ8(df: DataFrame, idCol: String, embCol: String,
                k: Int = 5, seeding: CentroidSeeding = HashSampledCentroids(),
                nprobe: Int = 3): DataFrame =
    ivfTopKOverBase(pinCkpt(int8Codes(df, idCol, embCol)), k, seeding, nprobe)

  /** Recall of an approximate neighbor list against the exact one —
    * the eval harness every ANN deployment runs before trusting an
    * index (FAISS's `recall@k`): per query vector, how many of the
    * EXACT top-k neighbors the approximate search returned, as a
    * count and a truncating per-mille. Both inputs use the ranked
    * `(vec_id, rank, neighbor_id, …)` schema the whole family emits
    * ([[bruteForceTopK]] ground truth vs [[ivfTopK]]/[[pqTopK]]/…).
    * Set membership only — ranks and sims don't enter — so the
    * result is integer-exact.
    *
    * Shape at 100 TB: ground truth is the expensive side (brute
    * force is O(n·|queries|)) — production evals run it on a query
    * SAMPLE, which this operator inherits by taking the frames as
    * inputs rather than building them. The overlap is a left-semi
    * join on (vec_id, neighbor_id) followed by two vec_id rollups —
    * every exchange keys on the query id; nothing is quadratic
    * here. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val gt = exact.groupBy("vec_id").agg(count(lit(1)).as("n_exact"))
    val hits = exact.select("vec_id", "neighbor_id")
      .join(approx.select("vec_id", "neighbor_id"),
        Seq("vec_id", "neighbor_id"), "left_semi")
      .groupBy("vec_id").agg(count(lit(1)).as("n_hits"))
    gt.join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000 div n_exact")
          .as("recall_permille"))
  }

  private def ivfTopKOverBase(base: DataFrame, k: Int,
                              seeding: CentroidSeeding,
                              nprobe: Int): DataFrame = {
    val ranked = ivfAssignmentOverBase(base, seeding, nprobe)
    val (index, probes) = ivfIndexAndProbes(ranked)
    val pairs = probes.join(index, Seq("cluster"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineQ(dotLong(col("qe_a"), col("qe_b")),
        col("nn_a"), col("nn_b")))
    explodeRanked(pairs.groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(col("sim"), col("neighbor_id"), k).as("tk")))
  }

  /** Per-vector IVF centroid assignment: (vec_id, tk = nprobe best
    * centroids best-first, qe, nn). Centroid set per `seeding`; the
    * ranking is a broadcast cross of the bounded centroid set + the
    * bounded [[TopKBySim]] aggregate ((csim desc, cid asc) — the same
    * deterministic order a row_number window would give, without
    * sorting the full n×k stream). Shared by [[ivfTopK]],
    * [[kmeansStep]] and [[cosineNearDupsIvf]]. */
  private def ivfAssignment(df: DataFrame, idCol: String, embCol: String,
                            seeding: CentroidSeeding, nprobe: Int): DataFrame =
    ivfAssignmentOverBase(pinCkpt(quantized(df, idCol, embCol)), seeding, nprobe)

  private def ivfAssignmentOverBase(base: DataFrame,
                                    seeding: CentroidSeeding,
                                    nprobe: Int): DataFrame = {
    val cents = seeding match {
      case HashSampledCentroids(k) =>
        // smallest-k (rollingHash(id), id): TakeOrderedAndProject —
        // per-partition top-k then a k-row driver merge, never a full
        // sort; |cents| ≤ k regardless of corpus size.
        base.select(col("vec_id").as("cid"), col("qe").as("cqe"),
            col("nn").as("cnn"),
            rollingHash(col("vec_id").cast("string")).as("ch"))
          .orderBy(col("ch"), col("cid"))
          .limit(k)
          .drop("ch")
      case ExplicitCentroids(ids) =>
        base.filter(col("vec_id").isin(ids: _*))
          .select(col("vec_id").as("cid"), col("qe").as("cqe"),
            col("nn").as("cnn"))
      case ProvidedCentroids(c) =>
        c.select(col("cid"), col("cqe"))
          .withColumn("cnn", dotLong(col("cqe"), col("cqe")))
          .filter(col("cnn") > 0)
    }

    // Empty-centroid guard rides the main job: an explicit seed list
    // none of whose ids carries a nonzero quantized vector must fail
    // loudly, not read as 0% recall (hash-sampled seeding cannot hit
    // this — nonempty input ⇒ nonempty centroid set). A driver-side
    // `require(!cents.isEmpty)` costs one extra scan-shaped job at
    // EVERY plan build (the bench paid it on warmup + each timed run),
    // so instead the broadcast is joined LEFT with an always-true
    // condition: with centroids present this is exactly the crossJoin
    // (every base row matches every centroid, cid never null); with
    // zero centroids every base row survives with a null cid and
    // raise_error fires on the first one. AQE's empty-relation rule
    // rewrites a left join with an empty build side to a
    // null-extending projection — the guard rows survive optimization
    // by construction. An empty INPUT yields an empty result
    // (nothing to search) instead of an error.
    pinCkpt(base.join(broadcast(cents), lit(true), "left")
      .withColumn("csim",
        when(col("cid").isNull, raise_error(lit(
          "no centroid candidates: no seed id carries a nonzero " +
            "quantized vector — check the explicit seed list against " +
            "the id space")))
          .otherwise(cosineQ(dotLong(col("qe"), col("cqe")),
            col("nn"), col("cnn"))))
      .groupBy(col("vec_id"))
      .agg(TopKBySim.top_k_by_sim(col("csim"), col("cid"), nprobe).as("tk"),
        first(col("qe")).as("qe"), first(col("nn")).as("nn")))
  }

  /** One Lloyd (k-means) refinement step over the IVF assignment — the
    * "train the centroids" half of an IVF index build (the hash-sample
    * seeding in [[ivfTopK]] is the init; production builds iterate
    * this step a few times before indexing).
    *
    * Every vector is assigned to its nearest seed centroid (same
    * broadcast argmax-cosine as the IVF index, nprobe = 1), then each
    * cluster's new centroid is the element-wise MEAN of its members'
    * quantized embeddings. Exact math end-to-end: integer sums by
    * (cluster, dimension), one IEEE double division — bit-exact in any
    * engine, so the step is driver-oracle-checkable unlike float kmeans.
    *
    * Returns `(cid, n_members, centroid array<double>)` — one row per
    * non-empty cluster.
    *
    * Shape at 100 TB: assignment is the broadcast map-side pass the
    * IVF family already uses; the update is ONE exchange keyed on
    * (cluster, dimension) — cardinality |centroids| × dim, partial
    * aggregation collapses the member stream map-side. No per-cluster
    * state on the driver. */
  def kmeansStep(df: DataFrame, idCol: String, embCol: String,
                 seeding: CentroidSeeding = HashSampledCentroids()): DataFrame = {
    val ranked = ivfAssignment(df, idCol, embCol, seeding, nprobe = 1)
    val assigned = ranked.select(
      col("tk").getItem(0).getField("neighbor_id").as("cid"), col("qe"))
    assigned
      .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("cid"))
      // sort_array on array<struct> orders by the leading field (pos),
      // so the rebuilt centroid is dimension-ordered deterministically
      .agg(max(col("n")).as("n_members"),
        sort_array(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n").cast("double")).as("m"))))
          .getField("m").as("centroid"))
  }

  /** Bounded fixed-iteration IVF centroid training: `steps` Lloyd
    * refinements chained from `seeding`'s init — the "train before
    * index" half of a production IVF build that [[kmeansStep]] (one
    * step, reporting means) exists to serve. Each step reassigns every
    * vector to its nearest current centroid (broadcast argmax-cosine,
    * the IVF assignment pass) and re-centers each cluster at the
    * per-dimension FLOOR-MEAN of its members, re-quantized to integers
    * so the next assignment round — and the DuckDB oracle — replay
    * bit-exactly (`floor(sum::double / count)`: the division is IEEE
    * correctly rounded, so both engines floor the identical double;
    * raw double centroids would accumulate order-dependent dot
    * products downstream).
    *
    * Fixed iteration count, NO convergence probe: 2-3 steps capture
    * most of the inertia drop (the standard IVF recipe), and a probe
    * would add a driver action per step for nothing at this budget.
    *
    * Shape at 100 TB: per step, one broadcast assignment pass over the
    * corpus + ONE exchange keyed on (cluster, dimension) — cardinality
    * |centroids|·dim, map-side combined; the centroid frame itself
    * stays broadcast-sized throughout.
    *
    * @return (cid LONG, cqe ARRAY<LONG>) — one row per non-empty,
    *         non-zero trained centroid. */
  def trainIvfCentroids(df: DataFrame, idCol: String, embCol: String,
                        steps: Int = IvfTrainSteps,
                        seeding: CentroidSeeding = HashSampledCentroids()): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps 1..8: $steps")
    trainOverBase(pinCkpt(quantized(df, idCol, embCol)), steps, seeding)
  }

  private def trainOverBase(base: DataFrame, steps: Int,
                            init: CentroidSeeding): DataFrame = {
    var seeding = init
    var cents: DataFrame = null
    for (_ <- 1 to steps) {
      val ranked = ivfAssignmentOverBase(base, seeding, nprobe = 1)
      cents = ranked
        .select(col("tk").getItem(0).getField("neighbor_id").as("cid"),
          posexplode(col("qe")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"),
          floor(col("s").cast("double") / col("n").cast("double"))
            .cast("long").as("q")))).getField("q").as("cqe"))
      seeding = ProvidedCentroids(cents)
    }
    cents
  }

  /** IVF top-k over TRAINED centroids: [[trainIvfCentroids]] feeding
    * [[ivfTopK]]'s search — the full production index-build shape
    * (seed → Lloyd-refine → index → multi-probe search). Same output
    * contract as [[ivfTopK]]; still deterministic and oracle-exact
    * because every stage is integer-quantized. */
  def ivfTopKTrained(df: DataFrame, idCol: String, embCol: String,
                     k: Int = 5, steps: Int = IvfTrainSteps,
                     seeding: CentroidSeeding = HashSampledCentroids(),
                     nprobe: Int = 3): DataFrame = {
    val base = pinCkpt(quantized(df, idCol, embCol))
    val trained = pinCkpt(trainOverBase(base, steps, seeding))
    ivfTopKOverBase(base, k, ProvidedCentroids(trained), nprobe)
  }

  /** (index, probes) faces of an [[ivfAssignment]]: candidates live in
    * their single home cluster (best centroid); queries probe their
    * nprobe nearest clusters. */
  private def ivfIndexAndProbes(ranked: DataFrame): (DataFrame, DataFrame) = {
    val index = ranked
      .select(col("vec_id").as("neighbor_id"),
        col("tk").getItem(0).getField("neighbor_id").as("cluster"),
        col("qe").as("qe_b"), col("nn").as("nn_b"))
    val probes = ranked
      .select(col("vec_id"), explode(col("tk")).as("probe"),
        col("qe").as("qe_a"), col("nn").as("nn_a"))
      .select(col("vec_id"), col("probe.neighbor_id").as("cluster"),
        col("qe_a"), col("nn_a"))
    (index, probes)
  }

  /** IVF-bucketed embedding near-dup pairs — the scale path for
    * [[cosineNearDups]]: pairs are generated CLUSTER-LOCALLY (each
    * vector indexed under its nearest centroid, probed from its nprobe
    * nearest), so candidate volume is Σ|cluster|·nprobe-bounded instead
    * of n²; at a 1000-executor scale each cluster bucket is an
    * independent partition of the shuffle on `cluster`. Approximate
    * like every IVF method: a qualifying pair is missed only when
    * neither vector probes the other's home cluster (near-dups have
    * near-identical centroid rankings, so recall is high — the spec
    * measures it against the brute-force face). Multi-probe finds a
    * pair from both sides; `least/greatest + distinct` restores the
    * one-row-per-pair (vec_a < vec_b) contract.
    *
    * @return (vec_a, vec_b, sim), vec_a < vec_b, sim = quantized cosine
    *         (bit-exact across engines — same math as the brute face) */
  def cosineNearDupsIvf(df: DataFrame, idCol: String, embCol: String,
                        threshold: Double,
                        seeding: CentroidSeeding = HashSampledCentroids(),
                        nprobe: Int = 3): DataFrame = {
    val ranked = ivfAssignment(df, idCol, embCol, seeding, nprobe)
    val (index, probes) = ivfIndexAndProbes(ranked)
    probes.join(index, Seq("cluster"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineQ(dotLong(col("qe_a"), col("qe_b")),
        col("nn_a"), col("nn_b")))
      .filter(col("sim") >= threshold)
      .select(least(col("vec_id"), col("neighbor_id")).as("vec_a"),
        greatest(col("vec_id"), col("neighbor_id")).as("vec_b"), col("sim"))
      .distinct()
  }
}
