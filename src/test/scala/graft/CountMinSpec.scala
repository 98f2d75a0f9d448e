package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def toks(ts: String*) = ts.toDF("token")

  test("estimate is one-sided: >= exact for every queried token") {
    val stream = toks(Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq.fill(1)("gamma") ++ Seq.fill(5)("delta"): _*)
    val sk = CountMin.sketch(stream)
    val exact = stream.groupBy("token").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(sk, exact)
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (t, n, e) =>
      assert(e >= n, s"token $t: estimate $e < exact $n")
    }
  }

  test("a lone token with no collisions estimates EXACTLY") {
    val stream = toks(Seq.fill(9)("solo"): _*)
    val est = CountMin.estimate(CountMin.sketch(stream),
      toks("solo").withColumn("n", lit(9L)))
      .as[(String, Long, Long)].collect()
    assert(est.toSeq == Seq(("solo", 9L, 9L)))
  }

  test("sketch is bounded by d x w rows regardless of input size and " +
      "MERGES by counter addition (the distributed-combine contract)") {
    val a = toks((0 until 500).map(i => s"tok${i % 37}"): _*)
    val b = toks((0 until 300).map(i => s"tok${i % 53}"): _*)
    val skA = CountMin.sketch(a)
    val skB = CountMin.sketch(b)
    assert(skA.count() <= CountMin.Depth * CountMin.Width)
    // merge = element-wise sum: sketch(A ++ B) == skA + skB
    val merged = skA.unionByName(skB)
      .groupBy("row", "idx").agg(sum(col("c")).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketch(a.unionByName(b))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole,
      "summing two sketches must equal the sketch of the union")
  }
}
