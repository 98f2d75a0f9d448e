package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TopKBuffer, TopKBySim}

class TopKBySimSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    b.sortedIndices.toSeq.map(i => (b.sims(i), b.ids(i)))

  test("buffer keeps the k best with (sim desc, id asc) order and tie-break") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 3L), (0.1, 7L), (0.9, 1L), (0.7, 2L), (0.5, 4L))
      .foreach { case (s, id) => b.insert(s, id) }
    assert(drain(b) == Seq((0.9, 1L), (0.9, 3L), (0.7, 2L)))
  }

  test("merge equals inserting everything into one buffer") {
    val all = (1 to 50).map(i => ((i * 37 % 23).toDouble / 23, i.toLong))
    val one = new TopKBuffer(5)
    all.foreach { case (s, id) => one.insert(s, id) }
    val (left, right) = all.splitAt(20)
    val b1 = new TopKBuffer(5); left.foreach { case (s, id) => b1.insert(s, id) }
    val b2 = new TopKBuffer(5); right.foreach { case (s, id) => b2.insert(s, id) }
    b2.sortedIndices.foreach(i => b1.insert(b2.sims(i), b2.ids(i)))
    assert(drain(b1) == drain(one))
  }

  test("aggregate over a DataFrame matches a window-function top-k") {
    val df = (1 to 200).map(i =>
      (i % 7L, ((i * 31) % 101).toDouble, i.toLong)).toDF("g", "sim", "id")
    val viaAgg = df.groupBy("g")
      .agg(TopKBySim.top_k_by_sim(col("sim"), col("id"), 4).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("nb.neighbor_id"), col("nb.sim"))
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaWindow = df.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= 4)
      .select(col("g"), col("rank"), col("id"), col("sim"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
