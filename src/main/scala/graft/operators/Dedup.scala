package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSigExpr, ShingleHashesExpr, SimHashExpr,
  SortedIntersectSizeExpr, TokenHashesExpr}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (canonical-fingerprint groupBy), MinHash signatures, LSH-banded
  * near-dup pair mining with exact n-gram-Jaccard verification, and
  * SimHash fingerprints.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is one hash-partitioned window/groupBy on a 128-bit
  *    fingerprint — a single shuffle on a high-cardinality key; no skew.
  *  - near-dup mining NEVER goes all-pairs: LSH banding reduces the
  *    candidate set to documents sharing a (band, hash-slice) bucket —
  *    one equi-self-join on the bucket key (shuffle-partitioned, AQE
  *    handles residual bucket skew) followed by exact verification of
  *    only the candidates. [[allPairsJaccard]] exists as the oracle/
  *    test baseline and for bounded blocks, not as the scale path.
  *  - every hash here is built on [[RollingHashExpr]] + affine
  *    (a*h+b) mod p permutations, so the DuckDB oracle can reproduce
  *    signatures bit-for-bit (SparkEntry.oracleSql generates its SQL
  *    from the same [[Coeffs]] constants — no drift possible).
  *
  * Reference context: the reference engine (Riachi02/BFS-MapReduce) has
  * no text ops; the closest analog is its order-preserving list dedup
  * (`BFS_map_reduce.py:18-22`) → `array_distinct` here. These operators
  * are the pipeline extensions the brief requires.
  */
object Dedup extends CachePinning {

  /** Modulus shared with [[RollingHashExpr.DefaultMod]]. */
  val P: Long = 1000000007L

  /** Fixed affine-permutation coefficients (a, b) for the MinHash
    * family h_i(x) = (a_i*x + b_i) mod P — canonical definition lives
    * with the native expression. */
  val Coeffs: Seq[(Long, Long)] = MinHashSigExpr.Coeffs

  /** Rows per LSH band; bands = Coeffs.size / BandRows = 4. With
    * signature k=8, r=2: P(candidate | sim s) = 1-(1-s^2)^4 — ~0.98 at
    * s=0.8, ~0.13 at s=0.2: a sharp high-similarity filter. */
  val BandRows = 2
  def numBands: Int = Coeffs.size / BandRows

  /** Distinct word n-gram shingles of the lowercased text. Texts with
    * fewer than n tokens produce one shingle of all tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(text), "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Rolling-hash of each DISTINCT shingle → array<long>, the MinHash
    * input — one native pass ([[ShingleHashesExpr]]); the composable
    * `transform(shingles(...), rolling_hash)` is what it replaces
    * (and what the DuckDB oracle still mirrors definitionally). */
  def shingleHashes(text: Column, n: Int): Column =
    ShingleHashesExpr.shingle_hashes(text, n)

  /** MinHash signature from a precomputed array<long> of shingle
    * hashes — one native pass over the array tracking all k minima
    * ([[MinHashSigExpr]]). */
  def minhashFromHashes(hs: Column): Column = MinHashSigExpr.minhash_sig(hs)

  /** k-component MinHash signature (k = Coeffs.size) as array<long>.
    * Component i = min over shingles of (a_i*rolling_hash + b_i) mod P;
    * P(component match) ≈ Jaccard similarity of the shingle sets. */
  def minhashSignature(text: Column, n: Int): Column =
    minhashFromHashes(shingleHashes(text, n))

  /** SimHash fingerprint of the whitespace tokens (30-bit, see
    * [[SimHashExpr]]). Near-identical texts have small Hamming
    * distance; compare with `bit_count(x ^ y)`. Token hashing runs in
    * one native pass ([[TokenHashesExpr]]) — the definitionally-equal
    * `transform(split(lower(text)), rolling_hash)` pays an interpreted
    * lambda per token (measured ~10x slower at sf0.1). */
  def simhash(text: Column): Column =
    SimHashExpr.simhash(TokenHashesExpr.token_hashes(text))

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact dedup by canonical fingerprint (case/punct/whitespace
    * insensitive md5, [[TextAnalysis.fingerprintMd5]]). Marks each row
    * with its group's canonical (min) id — one shuffle on the
    * fingerprint, no skew at scale (128-bit key). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedupFromFingerprints(df.select(col(idCol),
      TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint")), idCol)

  /** [[exactDedup]] over a PRECOMPUTED `fingerprint` column — for
    * pipelines whose shared text projection already pays the
    * fingerprint pass (corpus-prep v2). */
  def exactDedupFromFingerprints(base: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy("fingerprint")
    base.select(col(idCol), col("fingerprint"))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** Jaccard over distinct shingle-hash sets: |A∩B| / (|A|+|B|-|A∩B|).
    * Equal to string-set Jaccard absent cross-document hash collisions
    * (~|sh|²/2e9 per pair); integer-over-integer double division —
    * bit-exact in any engine, oracle-safe (the oracle computes the
    * same hash sets). */
  private def jaccardSim(hsA: Column, hsB: Column): Column = {
    val isz = size(array_intersect(hsA, hsB))
    isz.cast("double") / (size(hsA) + size(hsB) - isz)
  }

  /** All-pairs n-gram Jaccard ≥ threshold. O(n²) — the correctness
    * baseline for [[lshNearDups]] and for small bounded blocks only. */
  def allPairsJaccard(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs"))
    val a = base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("sim", jaccardSim(col("hs_a"), col("hs_b")))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
  }

  /** EXACT n-gram Jaccard near-duplicate pairs via prefix filtering
    * (the PPJoin principle): with each document's distinct shingle
    * hashes in a canonical (sorted) order, two sets with
    * J(A,B) >= t MUST share an element within the first
    * `|S| - ceil(t*|S|) + 1` elements of each — so exploding only that
    * prefix and equi-joining on the shingle hash finds every
    * qualifying pair, and the exact-Jaccard verify drops the rest.
    *
    * Complements [[lshNearDups]]: LSH is probabilistic (a band recall
    * curve), this is exact at the same never-all-pairs shape — one
    * prefix explode (≈(1-t) of the corpus shingle volume), one
    * equi-self-join on the prefix token with a max*t<=min length
    * filter, one verify join. The blowup guard is inherent: a shingle
    * appears in a candidate pair only through document pairs that
    * share it IN PREFIX, and prefixes shrink as t grows.
    *
    * Persists the (doc_id, sorted hashes) projection for its three
    * consumers; the persist backs the RETURNED frame — caller
    * releases after materializing ([[CachePinning.releaseCaches]]).
    *
    * @return (doc_a, doc_b, sim), doc_a < doc_b, sim = exact shingle
    *         Jaccard >= threshold */
  def jaccardNearDups(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val base = pinCkpt(df.select(col(idCol).as("doc_id"),
        sort_array(shingleHashes(col(textCol), n)).as("hs"))
      .withColumn("sz", size(col("hs"))))
    // prefix length |S| - ceil(t*|S|) + 1; the 1e-9 guards float error
    // in t*|S| UPWARD only (a longer prefix is always safe — candidates
    // grow, the exact verify keeps the result identical)
    val plen = (col("sz") -
      ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
    val prefixes = base.select(col("doc_id"), col("sz"),
      posexplode(slice(col("hs"), lit(1), plen)))
      .withColumnRenamed("col", "tok")
    // overlap needed for J >= t: o >= ceil(t/(1+t) * (|A|+|B|))
    val alpha = ceil(lit(threshold) / (lit(1.0) + threshold) *
      (col("x.sz") + col("y.sz")) - lit(1e-9))
    val cand = prefixes.as("x").join(prefixes.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id") &&
          // length filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|);
          // the 1e-9 guards float error DOWNWARD (t*max can round up
          // past an integer min it exactly equals — e.g. 0.28*25 =
          // 7.000000000000001 — and would silently drop a pair whose
          // exact Jaccard equals the threshold)
          greatest(col("x.sz"), col("y.sz")) * lit(threshold) - lit(1e-9) <=
            least(col("x.sz"), col("y.sz")) &&
          // positional filter (PPJoin): past match position p only
          // |S|-p elements remain, so the overlap can't reach alpha if
          // the shared token sits too deep in either sorted set
          least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos"))
            >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val sb = base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    // verify with a merge-scan intersection (arrays are sorted): same
    // value as size(array_intersect(...)) without a per-pair hash set
    val isz = SortedIntersectSizeExpr
      .sorted_intersect_size(col("hs_a"), col("hs_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("sim", isz.cast("double") /
        (size(col("hs_a")) + size(col("hs_b")) - isz))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
  }

  /** MinHash ESTIMATOR quality — the eval face for the dedup family's
    * sketch (what recall@k is to the ANN family): per LSH candidate
    * pair, the signature-match estimate of Jaccard (matching
    * components / k — the quantity LSH banding implicitly thresholds)
    * against the exact shingle-set Jaccard, plus the absolute error.
    * All three in truncating integer per-mille, so the evaluation of
    * the probabilistic sketch is itself hash-exact.
    *
    * Scope: candidate pairs only — the pairs the pipeline actually
    * judges (the estimator's error off the candidate set never
    * affects a decision). Shape at 100 TB: identical to
    * [[lshNearDupsFromHashes]] (one pinned projection, band
    * equi-join, per-pair O(|hs|) verify); the signature compare adds
    * k integer equality checks per pair. */
  def minhashEstQuality(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    val base = pinCkpt(df.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), n).as("hs"))
      .withColumn("sig", minhashFromHashes(col("hs"))))
    val bands = bandsOf(base)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h1") === col("y.h1") &&
          col("x.h2") === col("y.h2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
      col("sig").as("sig_a"))
    val sb = base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
      col("sig").as("sig_b"))
    val k = Coeffs.size
    // candidates always carry nonempty shingle sets (they banded), so
    // uni >= 1 — the truncating divisions are total
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_match", expr(
        "aggregate(zip_with(sig_a, sig_b, " +
          "(a, b) -> CASE WHEN a = b THEN 1L ELSE 0L END), " +
          "0L, (acc, x) -> acc + x)"))
      .withColumn("isz",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("isz"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"n_match * 1000 div $k").as("est_permille"),
        expr("isz * 1000 div uni").as("exact_permille"),
        expr(s"abs(n_match * 1000 div $k - isz * 1000 div uni)")
          .as("err_permille"))
  }

  /** Near-duplicate pairs via MinHash-LSH: band the k-component
    * signature into (k/r) bands of r rows; documents sharing any
    * band bucket become candidates (equi-self-join on the bucket key);
    * candidates are verified with exact shingle-set Jaccard ≥ threshold.
    *
    * Candidate generation is linear in the corpus + bucket-pair sized —
    * never all-pairs. Deterministic given [[Coeffs]], so the DuckDB
    * oracle reproduces the exact pair set.
    *
    * `maxBucketSize` guards the degenerate case (a near-identical
    * sub-corpus lands whole in one bucket → |bucket|² candidate pairs;
    * at web scale a boilerplate page repeated 10M times would emit
    * 10¹⁴ pairs): buckets larger than the cap are DROPPED — their
    * members are still found through their other (k/r - 1) bands
    * unless those are equally degenerate, in which case the content is
    * so duplicated that cluster-level dedup (exact fingerprint, which
    * scales linearly) is the right tool anyway. Default None preserves
    * exact oracle semantics.
    *
    * Persists the shingle+signature projection for its three
    * consumers; the persist backs the RETURNED frame, so the caller
    * releases it after materializing ([[CachePinning.releaseCaches]],
    * or the session-wide sweep Bench/Verify do). */
  def lshNearDups(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, threshold: Double = 0.5,
                  maxBucketSize: Option[Long] = None): DataFrame =
    lshNearDupsFromHashes(df.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs")), threshold, maxBucketSize)

  /** Explode a `(doc_id, sig, [carry...])` frame into one row per LSH
    * band: `(doc_id, band, h1, h2, carry...)`. Shared by the
    * within-set ([[lshNearDupsFromHashes]]) and cross-set
    * ([[incrementalDedupKept]]) band joins. */
  private def bandsOf(base: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val bandCols = (0 until numBands).map { j =>
      struct(lit(j).as("band"),
        element_at(col("sig"), j * BandRows + 1).as("h1"),
        element_at(col("sig"), j * BandRows + 2).as("h2"))
    }
    base.select(col("doc_id") +: carry.map(col) :+
        explode(array(bandCols: _*)).as("b"): _*)
      .select(Seq(col("doc_id"), col("b.band").as("band"),
        col("b.h1").as("h1"), col("b.h2").as("h2")) ++ carry.map(col): _*)
  }

  /** [[lshNearDups]] over a PRECOMPUTED `(doc_id, hs)` frame (`hs` =
    * the document's distinct shingle hashes as `array<long>`) — for
    * pipelines whose shared text projection already pays the shingling
    * pass (corpus-prep v2). */
  def lshNearDupsFromHashes(hsBase: DataFrame, threshold: Double = 0.5,
                            maxBucketSize: Option[Long] = None): DataFrame = {
    // Shingle + signature projection evaluated ONCE and cached: it
    // feeds three consumers (band explode, both sides of the verify
    // join) and is by far the dominant per-row cost. Without the
    // persist each consumer re-hashes every document from the source.
    // COLUMNAR persist, deliberately NOT a checkpoint pin (r20
    // session 2): the one same-window A/B that isolates this site
    // read pinCkpt slightly WORSE (q_neardup_clusters 2.35 -> 2.57 s,
    // CPU 19.8 -> 21.2) — the (hs, sig) arrays are large per row and
    // the three consumers' reads are cheaper off the columnar cache
    // than the row-block copy is to build here, unlike the narrow
    // bases the rest of the family checkpoint-pins.
    val base = pin(hsBase.select(col("doc_id"), col("hs"))
      .withColumn("sig", minhashFromHashes(col("hs"))))

    val allBands = bandsOf(base)
    val bands = maxBucketSize match {
      case None => allBands
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "h1", "h2")
        allBands.withColumn("__bsz", count(lit(1)).over(w))
          .filter(col("__bsz") <= cap).drop("__bsz")
    }

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h1") === col("y.h1") &&
          col("x.h2") === col("y.h2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sa = base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val sb = base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("sim", jaccardSim(col("hs_a"), col("hs_b")))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
  }

  /** Incremental dedup: which documents of a NEW batch survive against
    * an already-deduplicated EXISTING corpus — the operator a 100 TB
    * pipeline actually runs day to day (full-corpus re-dedup on every
    * ingest is a non-starter).
    *
    * A batch document is kept iff ALL of:
    *  1. its canonical fingerprint appears nowhere in `existing`;
    *  2. no existing document is an LSH-verified near-dup of it
    *     (Jaccard ≥ threshold);
    *  3. it is the exact-dedup canonical within the batch; and
    *  4. it is the near-dup CLUSTER canonical within the batch
    *     (same transitive semantics as [[nearDupClusters]]).
    * Rules 3-4 reuse the full-corpus operators on the (small) batch;
    * rules 1-2 are the incremental machinery.
    *
    * Scale shape — THE point of this operator: the existing corpus
    * NEVER shuffles. It streams exactly twice (once for fingerprints,
    * once for shingle/signature bands), each scan probing a BROADCAST
    * batch-side structure (distinct batch fingerprints; batch band
    * table); only batch-sized frames (matched fingerprints, candidate
    * pairs, verified drops) move through exchanges. The cross-verify
    * Jaccard rides the band join itself (existing-side shingle sets
    * carried through the explode), so no third corpus pass.
    *
    * @return the kept batch rows as `(doc_id)` (pass `batch` with an
    *         id column named by `idCol`; output uses `doc_id`). */
  def incrementalDedupKept(batch: DataFrame, existing: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val (bBase, batchRows) = pinWithCount(batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"),
        shingleHashes(col(textCol), n).as("hs"))
      .withColumn("sig", minhashFromHashes(col("hs"))))

    val (matchedFp, nearDropped) =
      incrementalCrossDrops(bBase, batchRows, existing, idCol, textCol,
        n, threshold)

    // rules 3-4 — within-batch canonicals, via the full-dedup operators
    val ec = exactDedupFromFingerprints(
        bBase.select(col("doc_id"), col("fingerprint")), "doc_id")
      .select(col("doc_id"), col("is_canonical").as("is_ec"))
    val nc = nearDupClustersFromHashes(
        bBase.select(col("doc_id"), col("hs")), threshold)
      .select(col("doc_id"), col("is_canonical").as("is_nc"))

    // the drop sets are batch-bounded and thin (ids/fingerprints, no
    // arrays) — but they inherit the same size gate as the probe
    // tables: a "batch" above the ceiling shouldn't smuggle a
    // hundreds-of-MB broadcast in through the anti joins either
    def hinted(df: DataFrame): DataFrame =
      if (batchRows <= MaxBroadcastBatchRows) broadcast(df) else df
    bBase.select(col("doc_id"), col("fingerprint"))
      .join(ec, "doc_id").join(nc, "doc_id")
      .join(hinted(matchedFp), Seq("fingerprint"), "left_anti")
      .join(hinted(nearDropped), Seq("doc_id"), "left_anti")
      .filter(col("is_ec") && col("is_nc"))
      .select(col("doc_id"))
  }

  /** Batch-row ceiling for the incremental-dedup broadcast hints. The
    * batch band table is |batch| × [[numBands]] rows each CARRYING the
    * full shingle-hash array — ~KBs/row — so an unconditional
    * broadcast() of a large "batch" would hit the broadcast size limit
    * or driver memory instead of degrading gracefully. Below the
    * ceiling the hint enforces the operator's shuffle-free corpus
    * contract; above it the hints are dropped and AQE picks the join
    * strategy (the corpus may then shuffle — correct, just no longer
    * the incremental fast path; at that batch size a full
    * [[nearDupClusters]] re-dedup is the honest choice anyway). */
  val MaxBroadcastBatchRows = 100000L

  /** The cross-corpus halves (rules 1-2) of [[incrementalDedupKept]],
    * over a PREBUILT (typically pinned) batch projection `bBase`
    * carrying `(doc_id, fingerprint, hs, sig)` — shared with
    * [[CorpusOps.incrementalPrepKept]], whose funnel already pays the
    * batch text pass and must not pay it twice. `batchRows` is the
    * pinned frame's row count (free via `pinWithCount`), gating the
    * broadcast hints against [[MaxBroadcastBatchRows]].
    *
    * Scale contract (THE point): the existing corpus NEVER shuffles —
    * it streams exactly twice (fingerprints; shingle/signature bands),
    * each scan probing a BROADCAST batch-side structure; the
    * cross-verify Jaccard rides the band join (existing-side shingle
    * sets carried through the explode), so no third corpus pass.
    *
    * @return (matched batch fingerprints, near-dropped batch doc_ids) */
  private[operators] def incrementalCrossDrops(
      bBase: DataFrame, batchRows: Long, existing: DataFrame,
      idCol: String, textCol: String,
      n: Int, threshold: Double): (DataFrame, DataFrame) = {
    val small = batchRows <= MaxBroadcastBatchRows
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df

    // rule 1 — cross-exact: stream existing fingerprints through a
    // broadcast probe of the batch's; only the matched (≤ |batch|)
    // fingerprints come back
    val bFp = bBase.select(col("fingerprint")).distinct()
    val matchedFp = existing
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .join(hinted(bFp), "fingerprint")
      .distinct()

    // rule 2 — cross-near: existing bands (shingle sets carried) probe
    // the broadcast batch band table; verify Jaccard in the same pass
    val eBands = bandsOf(existing.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), n).as("hs"))
      .withColumn("sig", minhashFromHashes(col("hs"))), carry = Seq("hs"))
    val bBands = bandsOf(bBase, carry = Seq("hs"))
      .select(col("doc_id").as("b_id"), col("band"), col("h1"), col("h2"),
        col("hs").as("hs_b"))
    val nearDropped = eBands.join(hinted(bBands), Seq("band", "h1", "h2"))
      .select(col("b_id").as("doc_id"),
        jaccardSim(col("hs"), col("hs_b")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("doc_id")).distinct()
    (matchedFp, nearDropped)
  }

  /** Edit-distance near-duplicate pairs: LSH band candidates verified
    * by LEVENSHTEIN distance on the raw text — the fuzzy-substring
    * face of the dedup family (shingle-Jaccard is order-insensitive
    * set overlap; edit distance additionally catches small in-place
    * mutations — the "same page, one number changed" near-dup class).
    *
    * Candidates come from the same banded MinHash pipeline as
    * [[lshNearDups]] (threshold 0: every band collision), so the
    * quadratic Levenshtein DP runs on the candidate set only — never
    * all pairs. At 100 TB the verify is a per-pair projection after
    * two id-keyed joins of the (small) candidate list against the
    * corpus; cost is bounded by candidates × len², with the band cap
    * guarding degenerate buckets.
    *
    * Levenshtein is the classical unit-cost edit distance, computed
    * identically in any engine — exact-int, oracle-checkable.
    *
    * @return (doc_a, doc_b, edits), doc_a < doc_b, edits <= maxEdits */
  def editNearDups(df: DataFrame, idCol: String, textCol: String,
                   maxEdits: Int, n: Int = 3,
                   maxBucketSize: Option[Long] = None): DataFrame = {
    require(maxEdits >= 0, s"maxEdits must be non-negative: $maxEdits")
    val cand = lshNearDups(df, idCol, textCol, n, threshold = 0.0,
      maxBucketSize).select(col("doc_a"), col("doc_b"))
    val txt = df.select(col(idCol), col(textCol))
    cand
      .join(txt.select(col(idCol).as("doc_a"), col(textCol).as("text_a")),
        "doc_a")
      .join(txt.select(col(idCol).as("doc_b"), col(textCol).as("text_b")),
        "doc_b")
      .withColumn("edits", levenshtein(col("text_a"), col("text_b")))
      .filter(col("edits") <= maxEdits)
      .select(col("doc_a"), col("doc_b"), col("edits"))
  }

  /** SimHash near-duplicate pairs: documents whose fingerprints differ
    * in at most `maxHamming` of the [[SimHashExpr.NumBits]] bits.
    *
    * Banded like [[lshNearDups]] but EXACT, not probabilistic: the
    * fingerprint is split into `maxHamming + 1` contiguous bit bands,
    * and by pigeonhole any pair within the Hamming budget matches at
    * least one band verbatim — so bucket-joining each band finds every
    * qualifying pair, and the bit_count verify drops false candidates.
    *
    * Banding runs over the DISTINCT fingerprints, not the documents:
    * real corpora repeat fingerprints heavily (boilerplate — at sf0.1
    * the 5000 synthetic docs hold only ~2500 distinct fingerprints, and
    * one band bucket covered 96% of docs), so doc-level banding squares
    * the duplication into the candidate join (measured 11.8M candidate
    * pairs where the distinct-fingerprint lattice has a few thousand).
    * Qualifying fingerprint pairs are verified FIRST (bit_count on the
    * tiny distinct set) and only then expanded back to document pairs —
    * the expansion emits exactly the output rows, so total cost is
    * O(distinct² within buckets + |output|), never all-pairs.
    *
    * Persists the (doc_id, fingerprint) projection for its multiple
    * consumers; the persist backs the RETURNED frame, so the caller
    * releases it after materializing ([[CachePinning.releaseCaches]],
    * or the session-wide sweep Bench/Verify do).
    *
    * @return (doc_a, doc_b, hamming), doc_a < doc_b, one row per pair */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val nBits = SimHashExpr.NumBits
    require(maxHamming >= 0 && maxHamming < nBits)
    val nb = maxHamming + 1
    val bounds = (0 to nb).map(i => i * nBits / nb)
    val base = pinCkpt(df.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh")))
    val sigs = pinCkpt(base.select(col("sh")).distinct())
    val bandCols = (0 until nb).map { j =>
      val off = bounds(j)
      val width = bounds(j + 1) - bounds(j)
      struct(lit(j).as("band"),
        shiftrightunsigned(col("sh"), off)
          .bitwiseAND(lit((1L << width) - 1)).as("v"))
    }
    val bands = sigs
      .select(col("sh"), explode(array(bandCols: _*)).as("b"))
      .select(col("sh"), col("b.band").as("band"), col("b.v").as("v"))
    // qualifying DISTINCT-fingerprint pairs, verified before expansion
    val sigPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.sh") < col("y.sh"))
      .select(col("x.sh").as("sh_a"), col("y.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        hammingDistance(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
    // cross-fingerprint doc pairs: every (a in group(sh_a), b in
    // group(sh_b)) — unique per pair since a doc has ONE fingerprint;
    // least/greatest restores the doc_a < doc_b contract
    val da = base.select(col("doc_id").as("ida"), col("sh").as("sh_a"))
    val db = base.select(col("doc_id").as("idb"), col("sh").as("sh_b"))
    val cross = sigPairs.join(da, "sh_a").join(db, "sh_b")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
    // same-fingerprint doc pairs (hamming 0) — true output, inherent
    val within = base.as("x").join(base.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    within.union(cross)
  }

  /** Cluster-level near-dup resolution: the end-to-end "dedup the
    * corpus" operator. [[lshNearDups]] mines verified pairs, connected
    * components groups transitively-linked documents (A≈B, B≈C ⇒ one
    * cluster even when A,C don't pair), and each cluster keeps its
    * min-id document as canonical. Every document appears in the
    * output; singletons are their own (size-1) cluster.
    *
    * All three phases are the scale-path formulations: LSH (never
    * all-pairs), CC as cheap label propagation with a star-contraction
    * fallback (near-dup pair graphs are almost always shallow — 1
    * shuffle/round wins — but a transitive boilerplate chain of 10^5
    * near-identical pages is exactly the deep-component case where
    * propagation hits its round cap; propagation now FAILS LOUDLY
    * there and the O(log n) star path picks it up), and a window for
    * cluster sizes (one shuffle on cluster id). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.5,
                      maxBucketSize: Option[Long] = None): DataFrame =
    nearDupClustersFromHashes(df.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs")), threshold, maxBucketSize)

  /** [[nearDupClusters]] over a PRECOMPUTED `(doc_id, hs)` frame — see
    * [[lshNearDupsFromHashes]]. */
  def nearDupClustersFromHashes(hsBase: DataFrame, threshold: Double = 0.5,
                                maxBucketSize: Option[Long] = None): DataFrame = {
    val pairs = lshNearDupsFromHashes(hsBase, threshold, maxBucketSize)
    val edges = GraphOps.symmetrize(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    // (id, comp) — paired docs only
    val comps =
      try ConnectedComponents.run(edges)
      catch { case _: IllegalStateException =>
        ConnectedComponents.runStarContraction(edges)
      }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
    hsBase.select(col("doc_id"))
      .join(comps, col("doc_id") === col("id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === col("cluster"))
  }

  /** Cross-document EXACT-SUBSTRING duplication report — the
    * span-level dedup signal document-level fingerprints cannot see
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better": repeated SUBSTRINGS — licenses, boilerplate
    * headers, quoted passages — survive every whole-document and
    * shingle-set dedup pass, and memorization tracks the substring
    * duplication rate, not the document one). Per document: the
    * merged spans of token positions covered by some `k`-token
    * window whose content also occurs in ANOTHER document, plus the
    * duplicated-token total and a truncating per-mille ratio.
    *
    * The reference suffix-array formulation is a single-machine
    * construction over the concatenated corpus — unbuildable at
    * 100 TB. The distributed re-expression: every k-token window →
    * one [[RollingHashExpr]] fingerprint; a window is duplicated iff
    * its fingerprint's posting spans ≥ 2 documents; a document's dup
    * spans are the gaps-and-islands merge of its duplicated window
    * positions. All arithmetic is integer and the oracle replays the
    * same hash, so (as with SQ8/PQ) the approximate path stays
    * hash-exact; fingerprint collisions (p ≈ n²/2P per bucket) are
    * the documented price of shuffling 8 bytes per window instead of
    * k tokens — the same trade every MinHash op above makes.
    *
    * Shape at 100 TB: the corpus is tokenized ONCE — the
    * (doc, pos, h) window frame is pinned and feeds all three
    * consumers (per-doc totals, the duplicated-fingerprint set, the
    * position probe). The dup-set groupBy and the probe join both
    * exchange on `h` — a 64-bit high-cardinality key (a viral
    * boilerplate gram is bounded by its corpus frequency and
    * AQE-splittable). The islands window partitions by doc_id —
    * document-bounded state, never corpus-bounded. Nothing is
    * quadratic and no posting list is ever collected. */
  def substringDupSpans(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    val (w, spans) = dupSpanFrames(df, idCol, textCol, k)
    val tot = w.groupBy("doc_id")
      .agg((max(col("pos")) + (k - 1)).as("n_tokens"))
    val agg = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s")).as("dup_tokens"))
    tot.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("coalesce(dup_tokens, 0L) * 1000 div n_tokens")
          .as("dup_permille"))
  }

  /** The shared span pipeline behind [[substringDupSpans]] (report)
    * and [[scrubDupSpans]] (apply): the PINNED (doc_id, pos, h)
    * window frame, and the merged duplicated spans
    * `(doc_id, s, e)` — `[s, e)` half-open over 1-based token
    * positions. */
  private def dupSpanFrames(df: DataFrame, idCol: String, textCol: String,
                            k: Int): (DataFrame, DataFrame) = {
    val toks = TextAnalysis.tokens(col(textCol))
    val w = pinCkpt(df
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => struct(i.cast("long").as("pos"),
          graft.functions.RollingHashExpr.rolling_hash(
            concat_ws(" ", slice(col("toks"), i, lit(k)))).as("h"))))
        .as("win"))
      .select(col("doc_id"), col("win.pos").as("pos"), col("win.h").as("h")))
    val dupH = w.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("h")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // gaps-and-islands: a window starts a new span iff it begins
    // past the furthest end seen so far ([pos, pos+k) half-open)
    val prevMaxEnd = max(col("pos") + k)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = w.join(dupH, "h").select("doc_id", "pos")
      .withColumn("brk",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k).as("e"))
      .select("doc_id", "s", "e")
    (w, spans)
  }

  /** APPLY half of the exact-substring dedup (the step Lee et al.
    * 2022 actually ship): rebuild every document with its cross-
    * document duplicated spans REMOVED. Returns one row per document
    * — including documents shorter than `k` (nothing to scrub) and
    * fully-duplicated documents (scrubbed to empty) — with the kept
    * token count and the md5 of the scrubbed text. The output text
    * is the tokenizer's CANONICAL form (lowercased, single-space
    * joined): span positions are token indexes, so the apply step is
    * defined over the token stream, not raw bytes.
    *
    * Shape at 100 TB: TWO corpus scans total — the span pass (pinned
    * window frame, see [[substringDupSpans]]) and the token pass that
    * rebuilds the text; the span set is dup-sized, tiny next to the
    * corpus, and meets the token stream in a doc-keyed anti-join
    * (equi on doc_id, range residual on the positions — never a
    * cartesian). Reassembly is a per-doc sort inside an aggregate —
    * document-bounded state, the same bound every tokenize op here
    * already carries. */
  def scrubDupSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8): DataFrame = {
    val (_, spans) = dupSpanFrames(df, idCol, textCol, k)
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))
    val sp = spans.select(col("doc_id").as("s_doc"), col("s"), col("e"))
    val kept = toks.join(sp,
      toks("doc_id") === sp("s_doc") &&
        col("pos") >= col("s") && col("pos") < col("e"), "left_anti")
    // tot derives from the INPUT frame, not the exploded token
    // stream: a document whose text tokenizes to zero tokens still
    // gets its contract row (n_tokens=0, empty scrub) instead of
    // silently vanishing from the output. size(tokens) equals the
    // exploded row count whenever rows exist, so this is
    // hash-identical on any corpus with >= 1 token per doc.
    val tot = df.select(col(idCol).cast("long").as("doc_id"),
        greatest(size(TextAnalysis.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tokens"))
      .groupBy("doc_id").agg(sum(col("n_tokens")).as("n_tokens"))
    val ka = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("scrub_text"))
    tot.join(ka, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("scrub_text"), lit(""))).as("scrub_md5"))
  }
}
