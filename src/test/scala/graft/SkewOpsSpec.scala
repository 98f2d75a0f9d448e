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

  test("saltedJoin == plain join (rows AND multiplicities), inner + left_outer") {
    // skewed fact: one hot key, plus dup rows to exercise multiplicity
    val fact = ((1 to 500).map(i => ("hot", i)) ++
        Seq(("cold", 1), ("cold", 1), ("orphan", 7))).toDF("k", "n")
    val dim = Seq(("hot", "H"), ("hot", "H2"), ("cold", "C"), ("unused", "U"))
      .toDF("k", "label")
    for (jt <- Seq("inner", "left_outer")) {
      val got = SkewOps.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8, jt)
        .select($"k", $"n", $"label")
        .as[(String, Int, Option[String])].collect().toSeq.sorted
      val direct = fact.join(dim, Seq("k"), jt)
        .select($"k", $"n", $"label")
        .as[(String, Int, Option[String])].collect().toSeq.sorted
      assert(got == direct, s"joinType=$jt")
    }
  }

  test("saltedJoin rejects right-replicating join types") {
    val df = Seq(("a", 1)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }

  test("saltedJoin survives a user column named __salt (collision guard)") {
    // a user column with the salt's default name must neither be
    // clobbered on the left nor duplicated on the right — the guard
    // picks the first free __saltN name
    val fact = Seq(("hot", 1, "keepL"), ("cold", 2, "keepL2"))
      .toDF("k", "n", "__salt0")
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "__salt")
    val got = SkewOps.saltedJoin(fact, dim, Seq("k"), saltBuckets = 4)
      .select($"k", $"n", $"__salt0", $"__salt")
      .as[(String, Int, String, String)].collect().toSeq.sorted
    val direct = fact.join(dim, Seq("k"))
      .select($"k", $"n", $"__salt0", $"__salt")
      .as[(String, Int, String, String)].collect().toSeq.sorted
    assert(got == direct)
    assert(got.map(_._3).toSet == Set("keepL", "keepL2")) // left col intact
  }

  test("saltedJoin tolerates unhashable (MapType) left columns") {
    // xxhash64 rejects MapType at analysis — the salt must skip map
    // columns instead of failing; rows still join correctly
    val fact = Seq(("hot", 1), ("hot", 2), ("cold", 3)).toDF("k", "n")
      .withColumn("props", map(lit("a"), $"n"))
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "label")
    val got = SkewOps.saltedJoin(fact, dim, Seq("k"), saltBuckets = 4)
      .select($"k", $"n", $"label")
      .as[(String, Int, String)].collect().toSeq.sorted
    val direct = fact.join(dim, Seq("k"))
      .select($"k", $"n", $"label")
      .as[(String, Int, String)].collect().toSeq.sorted
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

  test("aqeSkewJoinFace: AQE splits the hot partition (enforced inside) " +
      "and the result equals the plain join; session confs restored") {
    val dir = "/root/testdata/sf0.001"
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val before = keys.map(k => spark.conf.getOption(k))
    val got = SkewOps.aqeSkewJoinFace(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(keys.map(k => spark.conf.getOption(k)) == before,
      "face leaked session conf changes")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(when($"user_id" % 10 =!= 0, 0L).otherwise($"user_id").as("k"),
        $"value", $"props")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey".as("k"), ($"c_custkey" % 7).as("label"))
    val expected = ev.join(dim, "k").groupBy($"label")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total"),
        sum(length($"props")).as("pc"))
      .orderBy("label")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == expected)
  }
}
