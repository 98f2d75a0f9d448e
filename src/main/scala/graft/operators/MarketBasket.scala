package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over transaction baskets — the classic
  * market-basket co-occurrence analysis (support / confidence / lift)
  * a recommender or merchandising pipeline runs over order logs. The
  * reference has no relational analytics at all (its whole surface is
  * BFS over an edge list, `BFS_map_reduce.py:1-169`); this face is
  * beyond-parity capability on the same co-purchase data the BFS
  * graph is built from (FIXTURES.md §B).
  *
  * Semantics (all counts over DISTINCT basket membership — a basket
  * containing an item twice supports it once):
  *   - `support`   = |baskets containing both a and b|
  *   - `cnt_a/b`   = |baskets containing a| / |baskets containing b|
  *   - `support_ppm` = support·10^6 div N   (N = |baskets|)
  *   - `conf_ab_ppm` = support·10^6 div cnt_a   (P(b|a), truncated ppm)
  *   - `conf_ba_ppm` = support·10^6 div cnt_b
  *   - `lift_ppm`    = support·N·10^6 div (cnt_a·cnt_b)
  * Every metric is a truncating BIGINT division over exact integer
  * counts — order-independent, engine-exact, no floats anywhere (the
  * quantize-the-algorithm discipline; DuckDB `//` floors, Spark `div`
  * truncates, and all operands here are positive so the two agree).
  *
  * Shape at 100 TB: one exchange to distinct (basket, item); the
  * pair generation is a SELF-JOIN CO-PARTITIONED ON BASKET — both
  * sides are the same shuffled frame, so candidate pairs never cross
  * partitions and the work is Σ_baskets L², bounded by
  * `maxBasketSize`·Σ L (linear in corpus row count for a fixed cap).
  * The cap is the all-pairs guard, same role as `dfMax` in
  * [[Indexing.sparseCosineTopK]]: one pathological 10^6-item basket
  * would otherwise emit 10^12 pairs. Dropped baskets are whole-basket
  * drops (support stays consistent — a basket either contributes to
  * every pair count or none). Pair rollup is one map-side-combined
  * exchange on (item_a, item_b) with the `minSupport` filter applied
  * at the aggregate (the apriori support prune); item counts join
  * back by item (shuffle joins — the item dimension is corpus-sized
  * at scale, never broadcast); N rides a broadcast single-row
  * aggregate.
  *
  * Overflow headroom: lift's term bound is support·N·10^6 < 2^63,
  * i.e. support·N < 9.2e12 — fine to ~10^6 baskets at ppm scale; a
  * 10^10-basket corpus drops `scale` to 10^3 (per-mille) or splits
  * the division (`(support·scale div cnt_a)·N div cnt_b`) with one
  * extra ulp of truncation, documented at the call site.
  */
object MarketBasket {

  def assocRules(tx: DataFrame, basketCol: String, itemCol: String,
                 minSupport: Long = 2, maxBasketSize: Int = 1000,
                 scale: Long = 1000000L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val b0 = tx.select(col(basketCol).cast("long").as("bk"),
        col(itemCol).cast("long").as("it"))
      .distinct()
    // whole-basket cap: the all-pairs guard (see scaladoc)
    val sized = b0.groupBy("bk")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasketSize)
      .select("bk")
    val b = b0.join(sized, "bk")
    // N: single-row aggregate -> broadcast cross (bounded by construction)
    val n = b.select(count_distinct(col("bk")).as("n_baskets"))
    val itemCnt = b.groupBy("it").agg(count(lit(1)).as("cnt"))
    val pairs = b.as("a")
      .join(b.as("x"), col("a.bk") === col("x.bk") &&
        col("a.it") < col("x.it"))
      .groupBy(col("a.it").as("item_a"), col("x.it").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemCnt.select(col("it").as("item_a"), col("cnt").as("cnt_a")),
        "item_a")
      .join(itemCnt.select(col("it").as("item_b"), col("cnt").as("cnt_b")),
        "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("support"),
        col("cnt_a"), col("cnt_b"),
        expr(s"support * $scale div n_baskets").as("support_ppm"),
        expr(s"support * $scale div cnt_a").as("conf_ab_ppm"),
        expr(s"support * $scale div cnt_b").as("conf_ba_ppm"),
        // headroom enforced, not just documented: support·N·scale and
        // cnt_a·cnt_b silently wrap past 2^63 under non-ANSI Spark.
        // assert_true is NULL when the bound holds; the `+ ifnull`
        // keeps the guard load-bearing (see Ranking.withLog2Fixed).
        expr(s"support * n_baskets * $scale div (cnt_a * cnt_b) + " +
          s"ifnull(cast(assert_true(" +
          s"support <= ${Long.MaxValue} div $scale div n_baskets " +
          s"AND cnt_a <= ${Long.MaxValue} div cnt_b, " +
          s"concat('assocRules lift_ppm overflow: support=', support, " +
          s"' n_baskets=', n_baskets, ' cnt_a=', cnt_a, ' cnt_b=', " +
          s"cnt_b, ' scale=$scale')) as int), 0)")
          .as("lift_ppm"))
  }
}
