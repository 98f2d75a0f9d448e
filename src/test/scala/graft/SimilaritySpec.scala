package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f)),
    (25L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosineSim: exact values on unit axes") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
                 (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
                 (Array(1.0f, 0.0f), Array(-1.0f, 0.0f)))
      .toDF("a", "b")
    val sims = df.select(Similarity.cosineSim($"a", $"b")).as[Double].collect()
    assert(sims(0) == 0.0 && sims(1) == 1.0 && sims(2) == -1.0)
  }

  test("bruteForceTopK ranks nearest first with deterministic order") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 2)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(top(0L).head == 1L) // 0's nearest is 1
    assert(top(1L).head == 0L)
    assert(top(2L).head == 3L)
    assert(top(3L).head == 2L)
  }

  test("recallAtK: per-query overlap of exact vs approx, zero-hit " +
       "vectors kept, truncating per-mille") {
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L), (3L, 1, 30L))
      .toDF("vec_id", "rank", "neighbor_id")
    val approx = Seq((1L, 1, 11L), (1L, 2, 99L), (1L, 3, 12L),
      (2L, 1, 98L), (2L, 2, 97L), (3L, 1, 30L))
      .toDF("vec_id", "rank", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact).orderBy("vec_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 666L), (2L, 2L, 0L, 0L),
      (3L, 1L, 1L, 1000L)))
  }

  test("releaseCaches releases exactly the operator's pinned frames " +
       "(checkpoint pins live at the RDD layer since r20)") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val out = Similarity.cosineNearDups(vecs, "vec_id", "embedding", 0.9)
    out.count()
    assert(Similarity.pinnedCount > 0, "expected a registered pin")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the quantized projection's checkpoint blocks to be " +
        "pinned after materializing")
    Similarity.releaseCaches(blocking = true)
    assert(Similarity.pinnedCount == 0, "pin queue not drained")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseCaches left checkpoint blocks behind")
  }

  test("quantized sim tracks raw double cosine within quantization error") {
    val a = vecs.select($"vec_id", $"embedding")
    val pairs = a.as("x").crossJoin(a.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(
        Similarity.cosineSim(col("x.embedding"), col("y.embedding")).as("raw"),
        (Similarity.dotLong(Similarity.quantize(col("x.embedding")),
                            Similarity.quantize(col("y.embedding"))).cast("double") /
          (sqrt(Similarity.dotLong(Similarity.quantize(col("x.embedding")),
                                   Similarity.quantize(col("x.embedding"))).cast("double")) *
           sqrt(Similarity.dotLong(Similarity.quantize(col("y.embedding")),
                                   Similarity.quantize(col("y.embedding"))).cast("double"))))
          .as("quant"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (raw, quant) => assert(math.abs(raw - quant) < 5e-3) }
  }

  test("kmeansStep: exact element-wise means per nearest-seed cluster") {
    // explicit seeds 0 and 25 (the test fixture seeding): axis
    // vectors. Members 1,2 point near +x (join cluster 0); 26 points
    // near -x — BUT cosine to seed 25 (-x) is highest, so it joins
    // cluster 25. Means are exact integer-sum / count per dimension on
    // the quantized values.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // seed A (+x)
      (25L, Array(-1.0f, 0.0f)),  // seed B (-x)
      (1L, Array(0.8f, 0.2f)),    // -> A
      (2L, Array(0.6f, 0.0f)),    // -> A
      (26L, Array(-0.5f, 0.1f))   // -> B
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(vecs, "vec_id", "embedding",
        Similarity.ExplicitCentroids(Seq(0L, 25L)))
      .orderBy("cid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 25L))
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 3 && b.getLong(1) == 2) // n_members
    // cluster A: quantized xs (1000, 800, 600) -> 800.0; ys (0,200,0) -> 66.66..
    assert(a.getSeq[Double](2) == Seq(2400.0 / 3, 200.0 / 3))
    // cluster B: xs (-1000,-500) -> -750.0; ys (0,100) -> 50.0
    assert(b.getSeq[Double](2) == Seq(-750.0, 50.0))
    Similarity.releaseCaches(blocking = true)
  }

  test("trainIvfCentroids: Lloyd floor-means from explicit seeds; " +
       "ivfTopKTrained honors the top-k contract over trained centroids") {
    // same fixture as the kmeansStep test — one training step from
    // seeds {0, 25} must land on the floor of the exact means
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // seed A (+x)
      (25L, Array(-1.0f, 0.0f)),  // seed B (-x)
      (1L, Array(0.8f, 0.2f)),    // -> A
      (2L, Array(0.6f, 0.0f)),    // -> A
      (26L, Array(-0.5f, 0.1f))   // -> B
    ).toDF("vec_id", "embedding")
    val trained = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
        steps = 1, Similarity.ExplicitCentroids(Seq(0L, 25L)))
      .orderBy("cid").collect()
    assert(trained.map(_.getLong(0)).toSeq == Seq(0L, 25L))
    // A: floor(2400/3)=800, floor(200/3)=66; B: floor(-1500/2)=-750, 50
    assert(trained(0).getSeq[Long](1) == Seq(800L, 66L))
    assert(trained(1).getSeq[Long](1) == Seq(-750L, 50L))
    // search over the trained set: per-vector ranks 1..k, no self-hit
    val out = Similarity.ivfTopKTrained(vecs, "vec_id", "embedding",
        k = 2, steps = 1,
        seeding = Similarity.ExplicitCentroids(Seq(0L, 25L)), nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (v, _, nb, _) => v != nb })
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
    Similarity.releaseCaches(blocking = true)
  }

  test("ivfTopK: absent explicit seeds fail loudly inside the job, " +
       "empty input yields empty result") {
    // none of the explicit seed ids exists in the data — the 0%-recall
    // trap the guard exists for (hash-sampled seeding can't hit it: a
    // nonempty input always yields centroids). The failure rides the
    // main job (no extra plan-build-time job), surfacing at action
    // time — which, with eager pin(), is operator-construction time.
    val noCentroids = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.ivfTopK(noCentroids, "vec_id", "embedding", k = 1,
        Similarity.ExplicitCentroids(Seq(100L, 200L))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("no centroid candidates")),
      s"wrong failure: $ex")
    // nothing to search at all → empty result, not an error
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(empty, "vec_id", "embedding", k = 1).isEmpty)
  }

  test("cosineNearDupsIvf: near-identical twins recovered at high recall; " +
       "pairs are a subset of brute force with identical sims") {
    // the regime the operator targets: GENUINE near-dups (sim ≈ 1),
    // where near-identical vectors rank centroids near-identically and
    // cluster-local search finds the pair. Deterministic LCG fixture:
    // 100 base vectors + one perturbed twin each (sim ≥ 0.99).
    var seed = 42L
    def nextDouble(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val rows = (0 until 100).flatMap { i =>
      val base = Array.fill(8)(nextDouble().toFloat)
      val twin = base.map(x => x + 0.005f * nextDouble().toFloat)
      Seq((i.toLong, base), (1000L + i, twin))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val thr = 0.99
    val brute = graft.operators.Similarity
      .cosineNearDups(emb, "vec_id", "embedding", thr)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val ivf = Similarity
      .cosineNearDupsIvf(emb, "vec_id", "embedding", thr)
      .as[(Long, Long, Double)].collect()
    // no false positives, and any found pair carries the exact
    // brute-force sim (same quantized math)
    ivf.foreach { case (a, b, s) =>
      assert(a < b, s"pair order violated: ($a,$b)")
      assert(brute.contains((a, b)), s"($a,$b) not a true near-dup")
      assert(brute((a, b)) == s, s"sim mismatch for ($a,$b)")
    }
    // one row per pair (multi-probe both-sides finds must be deduped)
    assert(ivf.map(p => (p._1, p._2)).distinct.length == ivf.length)
    assert(brute.size >= 90, s"fixture degenerate: ${brute.size} true pairs")
    val recall = ivf.length.toDouble / brute.size
    info(f"IVF twin-recall@thr=$thr = $recall%.3f (${ivf.length}/${brute.size})")
    assert(recall >= 0.9, f"recall $recall%.3f too low for near-identical pairs")
  }

  test("cosineNearDupsIvf: recall on weakly-similar real pairs measured " +
       "(approximate by design)") {
    // sf0.001's pairs at 0.45 are barely-correlated random vectors —
    // the worst case for IVF bucketing (centroid rankings uncorrelated).
    // Document the measured floor rather than gating high.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val thr = 0.45
    val brute = graft.operators.Similarity
      .cosineNearDups(emb, "vec_id", "embedding", thr)
      .as[(Long, Long, Double)].collect().length
    val ivf = Similarity
      .cosineNearDupsIvf(emb, "vec_id", "embedding", thr)
      .as[(Long, Long, Double)].collect().length
    val recall = if (brute == 0) 1.0 else ivf.toDouble / brute
    info(f"IVF near-dup recall@thr=$thr on sf0.001 = $recall%.3f ($ivf/$brute)")
    assert(recall >= 0.3, f"recall $recall%.3f below the ivfTopK floor")
  }

  test("bruteForceTopKQ8: codes honor the int8 contract; recall vs " +
       "full precision bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // every code is in [-127, 127] and at least one coordinate per
    // vector saturates to ±127 (the max-|x| coordinate by construction)
    val codes = Similarity.int8Codes(emb, "vec_id", "embedding")
    val bounds = codes.select(
      max(expr("array_max(transform(qe, x -> abs(x)))")).as("mx"),
      min(expr("array_max(transform(qe, x -> abs(x)))")).as("mn"))
      .as[(Long, Long)].head()
    assert(bounds._1 == 127L && bounds._2 == 127L,
      s"per-vector max |code| should saturate at 127, got $bounds")
    // recall@5 vs the full-precision ranking: SQ8 keeps ~7 bits of
    // per-coordinate precision — ranks move only among near-ties
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val q8 = Similarity.bruteForceTopKQ8(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & q8).size.toDouble / exact.size
    info(f"SQ8 recall@5 vs full precision on sf0.001 = $recall%.3f")
    assert(recall >= 0.85, f"SQ8 recall $recall%.3f below floor")
  }

  test("ivfTopKQ8: composed IVF+SQ8 recall vs the SQ8 brute-force base") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the IVF pruning is the only approximation layered on top of the
    // SQ8 base, so recall vs bruteForceTopKQ8 should track the
    // full-precision ivfTopK recall vs bruteForceTopK (~0.38 at this
    // SF's centroid occupancy) — a collapse here would mean the Q8
    // codes broke the centroid assignment, not just moved near-ties
    val exact = Similarity.bruteForceTopKQ8(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopKQ8(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF+SQ8 recall@5 vs SQ8 brute force on sf0.001 = $recall%.3f")
    assert(recall >= 0.3, f"recall $recall%.3f below the ivfTopK floor")
  }

  test("ivfTopK: sf0.1 recall vs brute force (gated: SPARK_GRAFT_SF01_SPECS=1)") {
    // fixed-k seeding means the centroid GEOMETRY no longer changes
    // with the id space — but cluster occupancy does (sf0.1 packs ~50
    // vectors per cluster vs ~5 at sf0.01). Gated like the bench: slow
    // (brute force is all-pairs at sf0.1), run on demand.
    assume(sys.env.get("SPARK_GRAFT_SF01_SPECS").contains("1"),
      "set SPARK_GRAFT_SF01_SPECS=1 to run the sf0.1 recall spec")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    Similarity.releaseCaches(blocking = true)
    // probe 15% of the (fixed-size) centroid set — the fraction the
    // sf0.001 default spec establishes; with |centroids| pinned at k,
    // holding the fraction means a CONSTANT nprobe as the corpus
    // grows, which is exactly the scale property the seeding buys.
    val nprobe = math.max(3, (Similarity.DefaultNumCentroids * 3) / 20)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nprobe = nprobe)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    Similarity.releaseCaches(blocking = true)
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"IVF recall@5 at sf0.1 with nprobe=$nprobe " +
      f"(${Similarity.DefaultNumCentroids} centroids) = $recall%.3f")
    assert(recall > 0.3, f"recall $recall%.3f too low at sf0.1 with a " +
      "held probe fraction — centroid assignment degenerate on this corpus")
  }

  test("cosineNearDupsIvf: recall floor on confidently-similar pairs " +
       "(sim >= threshold + margin), ungated") {
    // the ungated recall BOUND (VERDICT r9 #4): pairs comfortably above
    // the threshold are the ones a production dedup must not miss —
    // borderline pairs (within the margin) may ride on either side of
    // the IVF bucketing, but confident pairs have near-identical
    // centroid rankings and must be found. Denominator: brute-force
    // pairs with sim >= thr + margin; hit = IVF emitted the pair.
    // sf0.01, not sf0.001: the smaller corpus has NO pair above
    // thr+margin (empty denominator ⇒ vacuous spec); 500 vectors keep
    // the brute-force face at spec cost. The synthetic embeddings are
    // near-random (max pair sim ≈ 0.51), so the operating threshold
    // sits at 0.35 to leave real pairs above the +0.10 margin.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val thr = 0.35
    val margin = 0.10
    val confident = graft.operators.Similarity
      .cosineNearDups(emb, "vec_id", "embedding", thr)
      .as[(Long, Long, Double)].collect()
      .filter(_._3 >= thr + margin)
      .map(p => (p._1, p._2)).toSet
    // nprobe 20 = a 20% probe fraction of the fixed-k centroid set:
    // the production tuning for the weakly-correlated regime (measured
    // curve on this fixture: 0.53 @ 3%, 0.80 @ 10%, 0.93 @ 20%). The
    // GENUINE near-dup regime (sim ≥ 0.99) holds ≥ 0.9 at the cheap
    // nprobe=3 default — the twins spec above enforces that one.
    val ivf = Similarity
      .cosineNearDupsIvf(emb, "vec_id", "embedding", thr, nprobe = 20)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2)).toSet
    assert(confident.nonEmpty, "no confident pairs at this SF — vacuous spec")
    val recall = (ivf & confident).size.toDouble / confident.size
    info(f"IVF confident-pair recall@thr+margin=${thr + margin}%.2f " +
      f"on sf0.01 = $recall%.3f (${(ivf & confident).size}/${confident.size})")
    assert(recall >= 0.9,
      f"recall $recall%.3f below the 0.9 floor on confidently-similar pairs")
  }

  test("ivfTopK: recall vs brute force on real embeddings is reasonable (3-probe)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.subsetOf(brute.map(identity) ++ ivf)) // sanity: shapes align
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"IVF 3-probe recall@5 = $recall%.3f")
    assert(recall > 0.3, f"recall $recall%.3f too low")
    // every IVF hit has the same sim the brute-force assigns that pair
    val bruteSims = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id", "sim").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val ivfSims = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5)
      .select("vec_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    ivfSims.foreach { case (a, b, s) =>
      bruteSims.get((a, b)).foreach(bs => assert(bs == s))
    }
  }

  test("pqTopK: deterministic across runs; self excluded; the " +
      "declared-dim guard fails loudly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.pqTopK(emb, "vec_id", "embedding", dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val b = Similarity.pqTopK(emb, "vec_id", "embedding", dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    assert(a == b, "PQ ranking must be bit-deterministic")
    assert(a.forall { case (v, _, n, _) => v != n }, "self in neighbors")
    assert(a.forall(_._4 >= 0L), "L2^2 distance cannot be negative")
    val e = intercept[Exception] {
      Similarity.pqTopK(emb, "vec_id", "embedding", dim = 32)
        .write.format("noop").mode("overwrite").save()
    }
    assert(e.getMessage != null)
  }

  test("pqTopK: recall@5 vs the exact L2 ranking bounded (PQ is an L2 " +
      "structure — cosine-ranked references are the wrong metric)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // exact L2^2 top-5, driver-side on the tiny SF (the reference
    // ranking in PQ's OWN metric; bruteForceTopK ranks by cosine,
    // which genuinely disagrees with L2 on non-normalized vectors)
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val exact = (for ((va, ea) <- vecs) yield {
      val nbrs = vecs.filter(_._1 != va).map { case (vb, eb) =>
        val d = ea.zip(eb).map { case (x, y) =>
          val dd = x.toDouble - y.toDouble; dd * dd }.sum
        (d, vb)
      }.sortBy(identity).take(5).map(_._2)
      nbrs.map(n => (va, n))
    }).flatten.toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", dim = 64, k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ recall@5 vs exact L2 on sf0.001 = $recall%.3f")
    // 32-bit codes from UNTRAINED (hash-sampled) codebooks against
    // 2048-bit quantized vectors: the floor is deliberately modest —
    // production recovers recall with Lloyd-trained codebooks, larger
    // ksub, and exact re-ranking of the PQ short-list
    // raw-ADC floor on near-random synthetic 64-d data (PQ's worst
    // case — tiny L2 gaps vs 32-bit quantization error); the re-rank
    // test below is the production recall story
    assert(recall >= 0.1, f"PQ recall $recall%.3f below floor")
  }

  test("pqTopKReranked: exact re-rank of the ADC shortlist recovers " +
      "recall (the production composition)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val exact = (for ((va, ea) <- vecs) yield {
      val nbrs = vecs.filter(_._1 != va).map { case (vb, eb) =>
        val d = ea.zip(eb).map { case (x, y) =>
          val dd = x.toDouble - y.toDouble; dd * dd }.sum
        (d, vb)
      }.sortBy(identity).take(5).map(_._2)
      nbrs.map(n => (va, n))
    }).flatten.toSet
    val rer = Similarity.pqTopKReranked(emb, "vec_id", "embedding",
        dim = 64, k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & rer).size.toDouble / exact.size
    info(f"PQ+rerank recall@5 vs exact L2 on sf0.001 = $recall%.3f")
    assert(recall >= 0.45, f"re-ranked recall $recall%.3f below floor")
    // the re-ranked distances are EXACT L2^2 for the emitted pairs
    val q = Similarity.quantize(org.apache.spark.sql.functions.col("embedding"))
    val qmap = emb.select(org.apache.spark.sql.functions.col("vec_id"), q.as("qe"))
      .as[(Long, Array[Long])].collect().toMap
    Similarity.pqTopKReranked(emb, "vec_id", "embedding", dim = 64, k = 5)
      .as[(Long, Int, Long, Long)].collect().take(50).foreach {
        case (v, _, n, d) =>
          val (a, b) = (qmap(v), qmap(n))
          val want = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
          assert(d == want, s"pair ($v,$n): emitted $d, exact L2^2 $want")
      }
  }

  test("ivfPqTopK: a subset of the flat PQ ranking (IVF only prunes " +
      "candidates), deterministic, and cluster-locally consistent") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val flat = Similarity.pqTopK(emb, "vec_id", "embedding", dim = 64,
        k = 1000) // >= |vectors| at sf0.001: the FULL ADC ranking
      .select("vec_id", "neighbor_id", "dist")
      .as[(Long, Long, Long)].collect()
      .map { case (v, n, d) => (v, n) -> d }.toMap
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding", dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(ivfpq.nonEmpty)
    // every emitted pair carries the IDENTICAL ADC distance the flat
    // scan assigns — IVF restricts the candidate set, never the math
    ivfpq.foreach { case (v, _, n, d) =>
      assert(flat((v, n)) == d, s"($v,$n): ivfpq $d != flat ${flat((v, n))}")
    }
    // determinism across runs
    val again = Similarity.ivfPqTopK(emb, "vec_id", "embedding", dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(ivfpq.sorted == again.sorted)
    // pruning is real on this data: at least one query's IVF-PQ top-5
    // differs from the flat PQ top-5 (otherwise the face would be
    // indistinguishable from q_ann_pq and prove nothing)
    val flatTop = Similarity.pqTopK(emb, "vec_id", "embedding", dim = 64)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfTop = ivfpq.map { case (v, _, n, _) => (v, n) }.toSet
    assert(ivfTop != flatTop, "IVF probing pruned nothing — face degenerate")
  }
}
