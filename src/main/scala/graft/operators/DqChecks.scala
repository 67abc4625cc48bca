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

  // -- whole-table column profile -----------------------------------------

  /** One-pass column-profiling suite over `orders` — the per-column
    * null count / exact distinct count / min / max summary every pipeline
    * snapshots before training (the reference eyeballs exactly this via
    * `summary()`/`str()` at 02_DataCleaning.R:22-40; here it is one
    * declarative, rerunnable pass emitting a long-form profile table).
    *
    * Exactness: counts are BIGINTs; min/max render through type-specific
    * exact paths — integers cast to string, the double price through the
    * DECIMAL(18,2)-cents convention (never raw double formatting, which
    * differs across engines), timestamps through a fixed format string.
    *
    * Scale shape (100 TB discipline):
    *  - TWO column-pruned scans, each the cheap plan for its aggregate
    *    family (r19 optimization round, guide §1.2/§2.3). The original
    *    single-agg form mixed the 6 exact `countDistinct`s with string
    *    min/max buffers, and a string in the aggregation buffer bars
    *    HashAggregate — Spark planned a THREE-level SortAggregate cascade
    *    that sorted the ×7-Expanded input twice by all 7 expand keys
    *    (measured 3.1 s of the query's 3.8 s at sf0.1). Split, the
    *    distinct pass is Expand + codegen HashAggregate (long buffers,
    *    map-side partials) and the null/min/max pass is one keyless
    *    aggregate over the un-expanded scan (0.9 s total; plan diff in
    *    plans/r19/q_col_profile_{before,after}.txt). At 100 TB the same
    *    argument holds stronger: the sort of the ×7 expansion is the
    *    catalog's worst-case shuffle amplification, while both split
    *    passes combine map-side;
    *  - at 100 TB the exact distincts substitute `approx_count_distinct`
    *    (HLL±2%, drops the Expand entirely and re-merges into ONE scan) —
    *    the profile is precisely what the sketch exists for; the oracle
    *    pins the exact form at verify scale;
    *  - the `stack` unpivot runs on the ONE joined row — free (the
    *    crossJoin is a broadcast of a single aggregated row). */
  def colProfile(spark: SparkSession, dir: String): DataFrame = {
    def nulls(c: String) =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")
    def dist(c: String) = countDistinct(col(c)).as(s"nd_$c")
    val orders = Tables.orders(spark, dir)
    val dists = orders.agg(
      dist("o_orderkey"), dist("o_custkey"), dist("o_orderstatus"),
      dist("o_totalprice"), dist("o_orderdate"), dist("o_orderpriority"))
    val ag = orders.agg(
      count(lit(1)).as("n_rows"),
      nulls("o_orderkey"),
      min(col("o_orderkey")).cast(StringType).as("mn_o_orderkey"),
      max(col("o_orderkey")).cast(StringType).as("mx_o_orderkey"),
      nulls("o_custkey"),
      min(col("o_custkey")).cast(StringType).as("mn_o_custkey"),
      max(col("o_custkey")).cast(StringType).as("mx_o_custkey"),
      nulls("o_orderstatus"),
      min(col("o_orderstatus")).as("mn_o_orderstatus"),
      max(col("o_orderstatus")).as("mx_o_orderstatus"),
      nulls("o_totalprice"),
      (min(col("o_totalprice")).cast(DecimalType(18, 2)) * 100)
        .cast(LongType).cast(StringType).as("mn_o_totalprice"),
      (max(col("o_totalprice")).cast(DecimalType(18, 2)) * 100)
        .cast(LongType).cast(StringType).as("mx_o_totalprice"),
      nulls("o_orderdate"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
        .as("mn_o_orderdate"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
        .as("mx_o_orderdate"),
      nulls("o_orderpriority"),
      min(col("o_orderpriority")).as("mn_o_orderpriority"),
      max(col("o_orderpriority")).as("mx_o_orderpriority"))
      .crossJoin(broadcast(dists))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(",\n  ")
    ag.select(col("n_rows"), expr(
        s"""stack(${cols.size},
           |  $stackArgs)
           |  AS (col_name, n_null, n_distinct, min_repr, max_repr)"""
          .stripMargin))
      .select(col("col_name"), col("n_rows"),
        col("n_null").cast(LongType), col("n_distinct").cast(LongType),
        col("min_repr"), col("max_repr"))
      .orderBy("col_name")
  }

  /** Benford's-law expected first-digit shares log₁₀(1 + 1/d), fixed
    * 6-dp literals — baked constants, so no libm ever runs near the hash
    * gate (the bigram-LM rule). */
  val BenfordShares: Seq[Double] = Seq(
    0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  /** Benford first-digit screen over order totals — the forensic gauge
    * auditors run on monetary columns (fabricated or synthetically
    * generated amounts miss the log-uniform leading-digit law). Each
    * digit row reports its count, observed share, the Benford
    * expectation and the signed excess; on THIS corpus the generator's
    * uniform price draw fails Benford loudly (digits 1–4 each carry
    * ~22% against 30/18/12/10%) — the deviation branch is
    * data-exercised by construction, like the planted DQ holes.
    *
    * Exactness: the leading digit comes from the DECIMAL-cents integer
    * rendered as a string — pure integer/string ops, identical in both
    * engines; shares are one IEEE division each, the expectations are
    * shared literals.
    *
    * Scale shape: one map-side-combinable 9-group count; everything
    * after runs on the 9-row table. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(substring((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).cast(StringType), 1, 1).cast(LongType).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    // global window over a BOUNDED table only: one row per leading digit
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val expected = BenfordShares.zipWithIndex
      .foldLeft(lit(0.0)) { case (acc, (p, i)) =>
        when(col("d") === (i + 1).toLong, lit(p)).otherwise(acc)
      }
    digits
      .withColumn("total", sum(col("n")).over(w))
      .select(col("d"), col("n"),
        round(col("n").cast(DoubleType) / col("total").cast(DoubleType), 6)
          .as("share"),
        expected.as("benford_share"),
        round(col("n").cast(DoubleType) / col("total").cast(DoubleType) -
          expected, 6).as("excess"))
      .orderBy("d")
  }

  /** DuckDB replay of [[benford]] — same digit derivation and literals. */
  val benfordOracleSql: String = {
    val cases = BenfordShares.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
    s"""WITH c AS (
       |  SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
       |    * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
       |  FROM orders),
       |g AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1),
       |t AS (SELECT d, n, SUM(n) OVER () AS total FROM g)
       |SELECT d, n,
       |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |  CAST(CASE d $cases ELSE 0.0 END AS DOUBLE) AS benford_share,
       |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) -
       |    CAST(CASE d $cases ELSE 0.0 END AS DOUBLE), 6) AS excess
       |FROM t ORDER BY d""".stripMargin
  }

  /** DuckDB replay of [[colProfile]] — the same aggregate row unpivoted
    * as UNION ALL branches, same type-specific min/max renderings. */
  val colProfileOracleSql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n_rows,
      |    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn1,
      |    COUNT(DISTINCT o_orderkey) AS nd1,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn1,
      |    CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
      |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn2,
      |    COUNT(DISTINCT o_custkey) AS nd2,
      |    CAST(MIN(o_custkey) AS VARCHAR) AS mn2,
      |    CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
      |    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn3,
      |    COUNT(DISTINCT o_orderstatus) AS nd3,
      |    MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
      |    SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn4,
      |    COUNT(DISTINCT o_totalprice) AS nd4,
      |    CAST(CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) * 100
      |      AS BIGINT) AS VARCHAR) AS mn4,
      |    CAST(CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) * 100
      |      AS BIGINT) AS VARCHAR) AS mx4,
      |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn5,
      |    COUNT(DISTINCT o_orderdate) AS nd5,
      |    strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5,
      |    strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5,
      |    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn6,
      |    COUNT(DISTINCT o_orderpriority) AS nd6,
      |    MIN(o_orderpriority) AS mn6, MAX(o_orderpriority) AS mx6
      |  FROM orders),
      |raw AS (
      |  SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_null,
      |    nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr FROM a
      |  UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM a
      |  UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3 FROM a
      |  UNION ALL SELECT 'o_totalprice', n_rows, nn4, nd4, mn4, mx4 FROM a
      |  UNION ALL SELECT 'o_orderdate', n_rows, nn5, nd5, mn5, mx5 FROM a
      |  UNION ALL SELECT 'o_orderpriority', n_rows, nn6, nd6, mn6, mx6
      |    FROM a)
      |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_null AS BIGINT) AS n_null,
      |  CAST(n_distinct AS BIGINT) AS n_distinct, min_repr, max_repr
      |FROM raw ORDER BY col_name""".stripMargin
}
