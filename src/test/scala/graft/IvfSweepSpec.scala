package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** r20 optimization gate: [[Similarity.ivfTopKSweep]] must be
  * bit-identical to running [[Similarity.ivfTopK]] once per probe depth
  * — the sweep shares ONE assignment + scored-candidate pass across
  * depths (the prefix-slicing argument in its scaladoc), and this spec
  * pins that the sharing is an optimization, not a semantics change. */
class IvfSweepSpec extends AnyFunSuite with SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sweep equals per-depth ivfTopK for every probe depth, both seedings") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = Seq(1, 3, 5)
    // hash-sampled (production) seeding
    val sweep = Similarity.ivfTopKSweep(emb, "vec_id", "embedding",
      k = 5, probes = probes).map { case (p, df) => (p, canon(df)) }.toMap
    Similarity.releaseCaches(blocking = true)
    probes.foreach { p =>
      val single = Similarity.ivfTopK(emb, "vec_id", "embedding",
        k = 5, nprobe = p)
      assert(sweep(p) == canon(single),
        s"sweep(nprobe=$p) diverged from ivfTopK(nprobe=$p)")
      Similarity.releaseCaches(blocking = true)
    }
    // trained (provided centroids) seeding — the trained-sweep face's path
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding")
      .localCheckpoint(true)
    val sweepT = Similarity.ivfTopKSweep(emb, "vec_id", "embedding",
      k = 5, seeding = Similarity.ProvidedCentroids(cents),
      probes = probes).map { case (p, df) => (p, canon(df)) }.toMap
    Similarity.releaseCaches(blocking = true)
    probes.foreach { p =>
      val single = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        seeding = Similarity.ProvidedCentroids(cents), nprobe = p)
      assert(sweepT(p) == canon(single),
        s"trained sweep(nprobe=$p) diverged from ivfTopK(nprobe=$p)")
      Similarity.releaseCaches(blocking = true)
    }
  }

  test("the shared checkpoint base (r20 session 2): every OnBase entry " +
       "point over one quantizedBase equals its df-entry twin") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = Similarity.quantizedBase(emb, "vec_id", "embedding")
    val bruteB = canon(Similarity.bruteForceTopKOnBase(base, k = 5))
    val ivfB = canon(Similarity.ivfTopKOnBase(base, k = 5, nprobe = 3))
    val trainedB = Similarity.trainIvfCentroidsOnBase(base)
      .localCheckpoint(true)
    val trainedIvfB = canon(Similarity.ivfTopKOnBase(base, k = 5,
      seeding = Similarity.ProvidedCentroids(trainedB), nprobe = 3))
    val sweepB = Similarity.ivfTopKSweepOnBase(base, k = 5,
      probes = Seq(1, 5)).map { case (p, df) => (p, canon(df)) }.toMap
    Similarity.releaseCaches(blocking = true)
    assert(bruteB ==
      canon(Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)))
    Similarity.releaseCaches(blocking = true)
    assert(ivfB ==
      canon(Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5, nprobe = 3)))
    Similarity.releaseCaches(blocking = true)
    assert(trainedIvfB ==
      canon(Similarity.ivfTopKTrained(emb, "vec_id", "embedding", k = 5,
        nprobe = 3)))
    Similarity.releaseCaches(blocking = true)
    Seq(1, 5).foreach { p =>
      assert(sweepB(p) ==
        canon(Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
          nprobe = p)), s"OnBase sweep(nprobe=$p) diverged")
      Similarity.releaseCaches(blocking = true)
    }
  }

  test("a single-depth sweep at the default probe count is ivfTopK") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val one = Similarity.ivfTopKSweep(emb, "vec_id", "embedding",
      k = 3, probes = Seq(3))
    assert(one.map(_._1) == Seq(3))
    val got = canon(one.head._2)
    Similarity.releaseCaches(blocking = true)
    assert(got ==
      canon(Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3, nprobe = 3)))
    Similarity.releaseCaches(blocking = true)
  }
}
