package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarketBasket

class MarketBasketSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // baskets: 1:[10,20,30] 2:[10,20] 3:[20,30] 4:[10]
  // (plus a duplicate membership row to pin the DISTINCT contract)
  private def tx = Seq(
    (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 20L), (3L, 30L),
    (4L, 10L)
  ).toDF("bk", "it")

  private def rules(minSupport: Long = 2, cap: Int = 1000) =
    MarketBasket.assocRules(tx, "bk", "it",
        minSupport = minSupport, maxBasketSize = cap)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("support/confidence/lift, hand-computed (duplicate membership " +
      "counts once; minSupport prunes the (10,30) singleton pair)") {
    // N=4; cnt(10)=3 cnt(20)=3 cnt(30)=2
    // (10,20): s=2 -> supp 500000, conf both 666666, lift 2*4e6/9=888888
    // (20,30): s=2 -> conf_ab 666666, conf_ba 1000000, lift 8e6/6=1333333
    assert(rules() == Seq(
      (10L, 20L, 2L, 3L, 3L, 500000L, 666666L, 666666L, 888888L),
      (20L, 30L, 2L, 3L, 2L, 500000L, 666666L, 1000000L, 1333333L)))
  }

  test("maxBasketSize drops the WHOLE oversized basket: counts, N and " +
      "supports all exclude it (consistency, not row truncation)") {
    // cap=2 removes basket 1 entirely: N=3, cnt(10)=2 cnt(20)=2 cnt(30)=1
    // pairs: (10,20) s=1 via basket 2; (20,30) s=1 via basket 3
    val r = rules(minSupport = 1, cap = 2)
    assert(r.map(t => (t._1, t._2, t._3)) ==
      Seq((10L, 20L, 1L), (20L, 30L, 1L)))
    val h = r.head
    assert((h._4, h._5) == (2L, 2L))
    assert(h._6 == 333333L) // 1e6/3
    assert(h._9 == 750000L) // 1*3*1e6/(2*2)
  }

  test("an independent pair lands at lift ~= 1, a perfectly-dependent " +
      "pair above it (the lift ordering the metric exists for)") {
    // dependent: 40,50 always together (2 baskets of 8);
    // independent-ish: 10 and 20 co-occur at chance
    val big = (Seq((100L, 40L), (100L, 50L), (101L, 40L), (101L, 50L)) ++
      (0 until 4).flatMap(i => Seq((200L + i, 10L))) ++
      (0 until 4).flatMap(i => Seq((300L + i, 20L))) ++
      Seq((200L, 20L), (201L, 20L))).toDF("bk", "it")
    val out = MarketBasket.assocRules(big, "bk", "it", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => ((r._1, r._2), r._9)).toMap
    assert(out((40L, 50L)) > out((10L, 20L)),
      "always-together pair must out-lift the chance pair")
    assert(out((40L, 50L)) == 5000000L) // 2*10e6/(2*2): lift 5.0
  }
}
