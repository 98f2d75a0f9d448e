package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SequencePacking

class SequencePackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (doc_id, shard, n_tokens)
  private val rows = Seq(
    (1L, "en", 100L), (2L, "en", 100L), (3L, "en", 60L), // pack 0: 260/256? no:
    (4L, "en", 300L),                                    // oversized doc
    (5L, "en", 10L), (6L, "en", 10L),
    (7L, "de", 256L), (8L, "de", 1L))
  private def df = rows.toDF("doc_id", "shard", "n_tokens")

  test("packGreedy: packs close when the next doc would overflow; " +
       "oversized docs get their own pack; shards independent") {
    val out = SequencePacking
      .packGreedy(df, "shard", "doc_id", "n_tokens", budget = 256L)
      .select($"doc_id", $"shard", $"pack_id", $"pack_tokens")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // en, budget 256: [1(100),2(100)]=200 | 3(60) would make 260 > 256
    // -> pack1: [3(60)] then 4(300) overflows any pack -> pack2 alone;
    // 5,6 -> pack3
    assert(out(1L) == ("en", 0L, 100L))
    assert(out(2L) == ("en", 0L, 200L))
    assert(out(3L) == ("en", 1L, 60L))
    assert(out(4L) == ("en", 2L, 300L)) // own pack, over budget
    assert(out(5L) == ("en", 3L, 10L))
    assert(out(6L) == ("en", 3L, 20L))
    // de: 256 exactly fills pack 0; 1 starts pack 1
    assert(out(7L) == ("de", 0L, 256L))
    assert(out(8L) == ("de", 1L, 1L))
  }

  test("packGreedy: no pack exceeds budget except single-doc overflows; " +
       "order within shard preserved") {
    val out = SequencePacking
      .packGreedy(df, "shard", "doc_id", "n_tokens", budget = 256L)
      .select($"shard", $"pack_id", $"doc_id", $"n_tokens")
      .as[(String, Long, Long, Long)].collect()
    out.groupBy(t => (t._1, t._2)).foreach { case (_, docs) =>
      val total = docs.map(_._4).sum
      assert(total <= 256L || docs.length == 1,
        s"pack ${docs.head._2} holds $total tokens across ${docs.length} docs")
    }
    // pack ids are non-decreasing in doc order per shard
    out.groupBy(_._1).foreach { case (_, docs) =>
      val byDoc = docs.sortBy(_._3).map(_._2)
      assert(byDoc.zip(byDoc.tail).forall { case (a, b) => a <= b })
    }
  }

  test("packByPrefixSum: integer-exact binning; equals greedy when docs " +
       "are budget-aligned") {
    val aligned = Seq((1L, "en", 128L), (2L, "en", 128L), (3L, "en", 128L),
      (4L, "en", 128L)).toDF("doc_id", "shard", "n_tokens")
    val ps = SequencePacking
      .packByPrefixSum(aligned, "shard", "doc_id", "n_tokens", 256L)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    val gr = SequencePacking
      .packGreedy(aligned, "shard", "doc_id", "n_tokens", 256L)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(ps == gr && ps == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("property: packGreedy == serial fold oracle on random shards") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen: Gen[Seq[(Long, String, Long)]] = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(0L, 400L))
      shards <- Gen.listOfN(n, Gen.oneOf("s1", "s2", "s3"))
    } yield toks.zip(shards).zipWithIndex.map { case ((t, sh), i) =>
      (i.toLong, sh, t)
    }
    def serialPack(docs: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
      var pack = 0L; var used = 0L; var first = true
      docs.sortBy(_._1).map { case (id, t) =>
        if (!first && used + t > budget) { pack += 1; used = 0L }
        used += t; first = false
        id -> pack
      }.toMap
    }
    (1 to 5).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { rows =>
        val budget = 256L
        val got = SequencePacking
          .packGreedy(rows.toDF("doc_id", "shard", "n_tokens"),
            "shard", "doc_id", "n_tokens", budget)
          .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
        val want = rows.groupBy(_._2).values.flatMap { shard =>
          serialPack(shard.map(r => (r._1, r._3)), budget)
        }.toMap
        assert(got == want, s"rows=$rows")
      }
  }

  test("packByPrefixSum overflow is bounded by one document") {
    val out = SequencePacking
      .packByPrefixSum(df, "shard", "doc_id", "n_tokens", 256L)
      .groupBy($"shard", $"pack_id")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("m"))
      .as[(String, Long, Long, Long)].collect()
    out.foreach { case (_, _, total, maxDoc) =>
      assert(total <= 256L + maxDoc)
    }
  }
}
