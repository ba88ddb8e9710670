package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Market-basket co-occurrence mining — frequent item PAIRS with exact
 * lift. The first (and in practice the dominant) level of association-rule
 * mining: "users who touch A also touch B", "documents tagged X carry Y".
 * Pair counting covers the overwhelming share of production basket
 * analysis without FP-growth's tree state, and it distributes as plain
 * joins and aggregates.
 *
 * Scale shape: baskets deduplicate to distinct (basket, item) rows first
 * (presence semantics); the pair join is an equi-join keyed on the basket
 * id, so a basket of size b contributes b·(b−1)/2 pair rows — quadratic
 * in BASKET size, linear in basket COUNT. `maxBasketSize` (opt-in) skips
 * degenerate mega-baskets (the "everyone bought the catalog" crawler
 * artifact) before the join; all other aggregates are map-side-combining
 * counts. Lift is carried in integer MICRO-units computed with
 * DECIMAL(38) products — overflow-safe at web scale and bit-exact across
 * engines (floored division).
 */
object Itemsets {

  /** Frequent pairs: (item_a, item_b, n_baskets, lift_ppm) for pairs
   * co-occurring in at least `minCount` baskets; item_a < item_b.
   * lift_ppm = ⌊10⁶ · n_ab · N / (n_a · n_b)⌋ with N = total baskets
   * (after the size cap). */
  def frequentPairs(
      df: DataFrame, basketCol: Column, itemCol: Column,
      minCount: Long, maxBasketSize: Int = 0): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val base0 = df
      .select(basketCol.as("graft_b"), itemCol.as("graft_i"))
      .where(col("graft_b").isNotNull && col("graft_i").isNotNull)
      .distinct()
    val base =
      if (maxBasketSize <= 0) base0
      else base0.join(
        base0.groupBy(col("graft_b")).agg(count(lit(1)).as("graft_bs"))
          .where(col("graft_bs") <= maxBasketSize).select(col("graft_b")),
        Seq("graft_b"), "leftsemi")
    val totals = base.agg(count_distinct(col("graft_b")).as("graft_n"))
    val itemCounts = base.groupBy(col("graft_i"))
      .agg(count(lit(1)).as("graft_ni"))
    base.as("a").join(base.as("b"),
        col("a.graft_b") === col("b.graft_b") &&
          col("a.graft_i") < col("b.graft_i"))
      .groupBy(col("a.graft_i").as("item_a"), col("b.graft_i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minCount)
      .join(itemCounts.select(col("graft_i").as("item_a"),
        col("graft_ni").as("graft_na")), Seq("item_a"))
      .join(itemCounts.select(col("graft_i").as("item_b"),
        col("graft_ni").as("graft_nb")), Seq("item_b"))
      .crossJoin(broadcast(totals))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        floor(
          (col("n_baskets").cast("decimal(38,0)") * lit(1000000L) * col("graft_n"))
            / (col("graft_na").cast("decimal(38,0)") * col("graft_nb")))
          .cast("long").as("lift_ppm"))
  }
}
