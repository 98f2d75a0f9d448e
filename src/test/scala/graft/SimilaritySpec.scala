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
}
