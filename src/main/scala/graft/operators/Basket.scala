package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Market-basket affinity mining: co-purchase pair supports + lift — the
  * A-priori first pass every recommender/affinity pipeline starts from.
  * (Reference analogue: none directly; its party-share pivot
  * 01_DataMerge.R:69-89 is the same co-occurrence-within-a-key shape.)
  *
  * Scale shape (100 TB discipline):
  *  - baskets are DISTINCT part sets per order (collect_set — the
  *    distinct happens inside ONE partial-aggregating exchange on
  *    l_orderkey, duplicate lines collapse map-side);
  *  - pair generation is an IN-ROW combination expansion over each
  *    sorted basket array (no self-join, no second shuffle of the kept
  *    rows); the expansion per order is C(basket, 2), bounded by
  *    [[MaxBasket]] — the same capped-expansion discipline as the LSH
  *    band joins (a pathological mega-basket is excluded AND COUNTED,
  *    never allowed to go quadratic);
  *  - supports/lift denominators are map-side-combinable counts; the
  *    final top-k is a TakeOrderedAndProject under a total order, never
  *    a global sort of the pair space. */
object Basket {

  /** Basket-size cap: orders with more distinct parts are excluded from
    * pair expansion. C(32,2) = 496 pairs max per order keeps the
    * expansion linearly bounded in input size whatever the data does. */
  private[graft] val MaxBasket = 32

  /** Top-k co-purchased part pairs with support and lift. */
  private[graft] val TopPairs = 25

  def coPurchase(spark: SparkSession, dir: String): DataFrame =
    coPurchaseOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")))

  /** [[coPurchase]] over an arbitrary (l_orderkey, l_partkey) frame —
    * split out (the *Of discipline) so BasketSpec can plant a
    * mega-basket: the testdata's largest basket is 17 distinct parts, so
    * the MaxBasket=32 exclusion is otherwise a dead branch in every
    * gate. */
  def coPurchaseOf(lines: DataFrame): DataFrame = {
    // r20 restructure (guide §2.4 — remove shuffles outright): ONE
    // groupBy(l_orderkey) with collect_set replaces the former
    // distinct → sized-join → kept cascade (whose plan re-derived
    // items/kept per consumer: 18 scans / 18 Exchanges,
    // plans/r20/q_copurchase_before.txt; an r19 localCheckpoint probe on
    // items/kept was a measured NO, 2.55 → 2.6-2.7 s). collect_set IS
    // the distinct at the basket grain, sort_array pins the in-basket
    // order, and pair expansion happens IN-ROW over the sorted array —
    // parts are distinct and ascending, so (parts[i], parts[j>i]) is
    // exactly the pa < pb distinct pair set the self-join produced, with
    // no second shuffle of the kept rows at all. Measured 2.53 → 1.87 s
    // isolated warm at sf0.1 (DevProbe, 5-run medians); a lazy
    // localCheckpoint on the basket frame probed within noise of the
    // plain recompute (1.83 s) and is left out.
    val baskets = lines.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) <= MaxBasket)
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val itemFreq = baskets
      .select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val pairs = baskets.select(explode(expr(
      "flatten(transform(parts, (x, i) -> " +
        "transform(slice(parts, i + 2, size(parts)), " +
        "y -> struct(x AS pa, y AS pb))))")).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
    pairs
      .join(itemFreq.select(col("l_partkey").as("pa"),
        col("n_item").as("n_a")), "pa")
      .join(itemFreq.select(col("l_partkey").as("pb"),
        col("n_item").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa").as("part_a"), col("pb").as("part_b"), col("support"),
        round(col("support").cast(DoubleType) * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("support").desc, col("part_a").asc, col("part_b").asc)
      .limit(TopPairs)
  }

  /** DuckDB replay of [[coPurchase]] — same cap, same total order. */
  def coPurchaseOracleSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |sized AS (
       |  SELECT l_orderkey FROM items GROUP BY 1
       |  HAVING COUNT(*) <= $MaxBasket),
       |kept AS (
       |  SELECT i.l_orderkey, i.l_partkey FROM items i
       |  JOIN sized s ON i.l_orderkey = s.l_orderkey),
       |n AS (SELECT COUNT(*) AS n_orders FROM sized),
       |freq AS (SELECT l_partkey, COUNT(*) AS n_item FROM kept GROUP BY 1),
       |pairs AS (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
       |  FROM kept a JOIN kept b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2)
       |SELECT p.pa AS part_a, p.pb AS part_b, p.support,
       |  ROUND(CAST(p.support AS DOUBLE) * n.n_orders /
       |    (fa.n_item * fb.n_item), 6) AS lift
       |FROM pairs p
       |JOIN freq fa ON p.pa = fa.l_partkey
       |JOIN freq fb ON p.pb = fb.l_partkey
       |CROSS JOIN n
       |ORDER BY support DESC, part_a ASC, part_b ASC
       |LIMIT $TopPairs""".stripMargin
}
