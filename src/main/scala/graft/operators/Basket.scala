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
  *  - baskets are DISTINCT (order, part) pairs — the distinct collapses
  *    duplicate lines map-side before any pair expansion;
  *  - pair generation is an equi self-join on l_orderkey: both sides hash
  *    to the same partitions, and AQE handles the build side; the
  *    expansion per order is C(basket, 2), bounded by [[MaxBasket]] —
  *    the same capped-expansion discipline as the LSH band joins (a
  *    pathological mega-basket is excluded AND COUNTED, never allowed to
  *    go quadratic);
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
    // r19 optimization round, measured NO: the initial physical plan
    // re-derives items/kept per consumer (18 scans / 52 Exchanges in
    // plans/r19/q_copurchase_before.txt), but localCheckpointing items
    // and/or kept moved the isolated warm median 2.55 s → 2.6-2.7 s at
    // sf0.1 — AQE's runtime exchange reuse already dedupes the identical
    // distinct/join subtrees, so the eager materialization only added
    // cost. Left recompute-shaped on that evidence (OPTIMIZATION_r19.md).
    val items = lines
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val sized = items.groupBy("l_orderkey")
      .agg(count(lit(1)).as("basket"))
      .filter(col("basket") <= MaxBasket)
      .select("l_orderkey")
    val kept = items.join(sized, "l_orderkey")
    val nOrders = sized.agg(count(lit(1)).as("n_orders"))
    val itemFreq = kept.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val pairs = kept.select(col("l_orderkey"), col("l_partkey").as("pa"))
      .join(kept.select(col("l_orderkey"), col("l_partkey").as("pb")),
        "l_orderkey")
      .filter(col("pa") < col("pb"))
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
