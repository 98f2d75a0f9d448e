package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedDistinctAndSum equals a direct groupBy on skewed data") {
    val df = (Seq.fill(5000)(("hot", 1.5)) ++
        (1 to 200).map(i => ("hot", i.toDouble)) ++
        Seq(("cold", 2.0), ("cold", 2.0), ("cold", 3.0)))
      .toDF("k", "v")
    val got = SkewOps.saltedDistinctAndSum(df, "k", "v", saltBuckets = 8)
      .orderBy("key").as[(String, Long, Long, Double)].collect().toSeq
    val direct = df
      .groupBy($"k".as("key"))
      .agg(count_distinct($"v".cast("decimal(30,6)")).as("n_distinct"),
        count(lit(1)).as("n"),
        sum($"v".cast("decimal(30,6)")).cast("double").as("total"))
      .orderBy("key").as[(String, Long, Long, Double)].collect().toSeq
    assert(got == direct)
  }

  test("raw values that collide after the decimal cast count as ONE distinct") {
    // 1.0000001 and 1.0000002 both round to decimal(30,6) 1.000000 —
    // salting by the RAW value would split them across buckets and
    // double-count; the salt must hash the post-cast value
    val df = Seq(("k", 1.0000001), ("k", 1.0000002), ("k", 2.0))
      .toDF("k", "v")
    val got = SkewOps.saltedDistinctAndSum(df, "k", "v", saltBuckets = 16)
      .select($"n_distinct").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }
}
