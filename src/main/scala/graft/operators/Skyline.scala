package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Skyline (Pareto frontier) operator — the multi-criteria "best
  * customers" query no single ORDER BY can express: every customer such
  * that no other customer is at least as good on BOTH dimensions (total
  * spend, recency) and strictly better on one. Spark has no skyline
  * operator; this is the composed-from-relational-ops form ((a) in the
  * brief's preference order), exact, with the dominance test never
  * leaving integer space (exact DECIMAL-cents spend, epoch-day recency).
  *
  * Scale shape — NO single-task global window (the textbook sort-based
  * skyline scan is one), via a two-level dominance prune:
  *  1. points pre-aggregate to one row per distinct x (y := max y at that
  *     x — only those can survive; equal-(x,y) witnesses rejoin at the
  *     end, because neither of two equal points dominates the other);
  *  2. x-space range-buckets into ≤256 integer cells (width from the
  *     broadcast min/max — two scalar aggregates); WITHIN a bucket the
  *     running max over x-descending rows is a PARTITIONED window;
  *     ACROSS buckets only the per-bucket max-y matters, and that
  *     suffix-max runs over the ≤256-row bucket table — the same
  *     bounded-table window discipline as the drift/histogram queries.
  *  A point survives iff its y strictly exceeds every higher-x max —
  *  within-bucket prefix AND higher-bucket suffix. Identical to the
  *  brute-force NOT EXISTS dominance (the oracle states exactly that,
  *  so the hash gate proves pruned ≡ brute force, the q_geo_nearest /
  *  q_stratified discipline).
  *
  * The quarter-slice on custkey keeps the oracle's quadratic NOT EXISTS
  * affordable at verify scale; the operator above the filter is the
  * general shape. */
object Skyline {

  val Buckets = 256L

  def query(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 4 === 0)
      .groupBy(col("o_custkey").as("c"))
      .agg(
        (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast(LongType).as("x"),
        max(datediff(col("o_orderdate").cast(DateType),
          lit("1970-01-01").cast(DateType))).cast(LongType).as("y"))
    // one row per distinct x: only the max-y point at each x can survive
    val xa = pts.groupBy("x").agg(max(col("y")).as("my"))
    val rng = pts.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val bucketed = xa.crossJoin(broadcast(rng))
      .select(col("x"), col("my"),
        expr(s"((x - mn) * $Buckets) div (mx - mn + 1)").as("b"))
    // within-bucket: running max of y over strictly-higher x (rows are
    // per-distinct-x, so a 1-preceding ROWS frame is exactly "higher x")
    val wIn = Window.partitionBy("b").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inb = bucketed.withColumn("hIn", max(col("my")).over(wIn))
    // across buckets: suffix max over the <=256-row bucket table
    val bmax = bucketed.groupBy("b").agg(max(col("my")).as("bm"))
    val wSuf = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val suf = bmax.withColumn("hUp", max(col("bm")).over(wSuf))
    val survivors = inb.join(broadcast(suf.select("b", "hUp")), "b")
      .filter(col("my") > greatest(
        coalesce(col("hIn"), lit(Long.MinValue)),
        coalesce(col("hUp"), lit(Long.MinValue))))
      .select(col("x"), col("my").as("y"))
    // rejoin the carriers: every customer sitting AT a surviving (x, y) —
    // equal points don't dominate each other, so all of them are skyline
    pts.join(broadcast(survivors), Seq("x", "y"))
      .select(col("c").as("custkey"), col("x").as("spend_cents"),
        col("y").as("last_day"))
      .orderBy(col("spend_cents").desc, col("custkey").asc)
  }

  /** DuckDB replay — the brute-force NOT EXISTS dominance definition
    * itself: the hash match proves the bucketed prune equals it. */
  val oracleSql: String =
    """WITH pts AS (
      |  SELECT o_custkey AS c,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |      AS x,
      |    CAST(MAX(datediff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE))) AS BIGINT) AS y
      |  FROM orders WHERE o_custkey % 4 = 0 GROUP BY 1)
      |SELECT c AS custkey, x AS spend_cents, y AS last_day
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
      |ORDER BY spend_cents DESC, custkey ASC""".stripMargin
}
