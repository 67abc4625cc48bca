package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Behavioral / product-analytics operators over the events stream table:
  * ordered conversion funnels and cohort retention — the two queries every
  * event-warehouse engine is asked for first. The reference has no event
  * stream, but its per-county time bucketing (02_DataCleaning.R:139) is the
  * same derive-a-grain-then-aggregate shape.
  *
  * Scale notes (100 TB discipline):
  *  - every pass is either a map-side-combinable hash aggregate keyed by
  *    user_id or an equi-join on user_id — co-partitioned by AQE, no
  *    windows, no per-user sorts;
  *  - the funnel's per-step state is ONE timestamp per user (the earliest
  *    time the step could have completed), not the user's event list —
  *    state size is users × steps, independent of event volume;
  *  - timestamps stay exact (micros); counts are exact BIGINTs; the only
  *    doubles are final conversion ratios (one IEEE division, rounded,
  *    replayed identically in the oracle).
  */
object Behavior {

  /** Ordered 3-step funnel view → click → purchase: a user completes step
    * k only with an event of step-k's type STRICTLY AFTER their step-(k−1)
    * completion time; completion time is the earliest such event (greedy
    * earliest-completion is optimal for ordered funnels: any valid
    * witness sequence can be pointwise lowered onto the greedy one).
    *
    * Three filtered aggregate passes — one per step — each a pushed-down
    * type filter, an equi-join on user_id against the (users-sized)
    * previous-step state, and a min() hash aggregate. No sort anywhere,
    * no driver-side actions: the per-step states left-join back together
    * (s1 ⊇ s2 ⊇ s3 by construction, so non-null t_k counts ARE the step
    * counts), fold to ONE row of three counters, and explode into the
    * 3-row report — a single job, with Catalyst's exchange reuse serving
    * s1/s2 to both consumers instead of recomputing per count() action. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelFrom(spark, Tables.events(spark, dir))

  /** Core of [[funnel]] over any (user_id, ts, event_type) frame. */
  def funnelFrom(spark: SparkSession, ev: DataFrame): DataFrame = {
    def step(typ: String) =
      ev.filter(col("event_type") === typ).select(col("user_id"), col("ts"))
    val s1 = step("view").groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = step("click").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = step("purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val counts = s1
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    counts
      .select(explode(array(
        struct(lit(1).as("step"), lit("view").as("step_name"),
          col("n1").as("users")),
        struct(lit(2).as("step"), lit("click").as("step_name"),
          col("n2").as("users")),
        struct(lit(3).as("step"), lit("purchase").as("step_name"),
          col("n3").as("users")))).as("s"))
      .select(col("s.step").as("step"), col("s.step_name").as("step_name"),
        col("s.users").as("users"))
      .withColumn("conv_prev",
        round(col("users").cast(DoubleType) /
          nullif(coalesce(lag(col("users"), 1).over(w), col("users")),
            lit(0L)), 6))
      .orderBy("step")
  }

  /** DuckDB replay of [[funnel]]: the same three min() passes chained as
    * CTEs; counts exact, conversions the same single rounded division. */
  val funnelOracleSql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      |  WHERE e.event_type = 'purchase' GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |             (SELECT COUNT(*) FROM s2) AS n2,
      |             (SELECT COUNT(*) FROM s3) AS n3)
      |SELECT step, step_name, users, conv_prev FROM (
      |  SELECT 1 AS step, 'view' AS step_name, n1 AS users,
      |    ROUND(CAST(n1 AS DOUBLE) / NULLIF(n1, 0), 6) AS conv_prev FROM n
      |  UNION ALL SELECT 2, 'click', n2,
      |    ROUND(CAST(n2 AS DOUBLE) / NULLIF(n1, 0), 6) FROM n
      |  UNION ALL SELECT 3, 'purchase', n3,
      |    ROUND(CAST(n3 AS DOUBLE) / NULLIF(n2, 0), 6) FROM n)
      |ORDER BY step""".stripMargin

  /** Weekly cohort retention: users cohorted by the epoch-week of their
    * first event; a cohort-week cell counts the users of that cohort with
    * any activity `week_offset` weeks later. Weeks are exact integer
    * epoch-day div 7 — no calendar/locale dependence to drift between
    * engines.
    *
    * Two passes: (1) per-user first-week — map-side-combinable min; (2) the
    * distinct (user, offset) activity grid — an equi-join on user_id plus a
    * distinct-aggregate, then the small (cohorts × offsets) count. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(spark, dir)
      .select(col("user_id"),
        (datediff(col("ts").cast(DateType), lit("1970-01-01").cast(DateType))
          .cast(LongType) / 7).cast(LongType).as("week"))
    val first = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    wk.join(first, "user_id")
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Last-touch attribution: each purchase's value is credited to the
    * user's most recent PRECEDING non-purchase event type (the marketing
    * channel) — `direct` when the purchase has no predecessor. One
    * carry-forward window per user (`last(ignoreNulls)` over (ts,
    * event_id) — the same pattern [[graft.operators.Relational.resampleFfill]]
    * pinned), then a channel-level aggregate in exact cents.
    *
    * Scale shape: per-user window partitions (millions of small
    * independent sorts after one hash exchange), then one
    * map-side-combinable aggregate over ≤ |event types| + 1 groups. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
          .as("cents"))
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
      .orderBy("channel")
  }

  /** DuckDB replay of [[attribution]] — same carry-forward frame. */
  val attributionOracleSql: String =
    """WITH t AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM events)
      |SELECT coalesce(channel, 'direct') AS channel,
      |  COUNT(*) AS n_purchases, CAST(SUM(cents) AS BIGINT) AS cents
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** A/B experiment readout: Welch's z for the purchase-value difference
    * between a planted deterministic assignment (variant = user_id % 2) —
    * the two-sample analysis every experimentation platform runs.
    *
    * Exactness discipline (same as metrics/OLS): the three sufficient
    * moments per variant — n, Σcents, Σcents² — are exact BIGINT sums
    * (order-independent at any parallelism; Σc² ≤ ~1e14 at sf0.1, far
    * under 2⁶³ — a 100 TB run would lift the squares to DECIMAL, same
    * interface), accumulated in ONE conditional-aggregate pass over the
    * pushed-down purchase filter. Mean/variance/z drop to double only in
    * the final expressions, written identically in the oracle.
    *
    * Scale shape: one scan, one 1-row aggregate. Nothing else moves. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast(LongType).as("v"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
    def m(side: Int, name: String) = Seq(
      sum(when(col("v") === side, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(col("v") === side, col("c")).otherwise(0L)).as(s"s_$name"),
      sum(when(col("v") === side, col("c") * col("c")).otherwise(0L))
        .as(s"q_$name"))
    val agg = m(0, "a") ++ m(1, "b")
    val row = ev.agg(agg.head, agg.tail: _*)
    def d(c: String) = col(c).cast(DoubleType)
    def mean(s: String) = d(s"s_$s") / d(s"n_$s")
    def variance(s: String) =
      (d(s"q_$s") - d(s"s_$s") * d(s"s_$s") / d(s"n_$s")) / (d(s"n_$s") - 1)
    row.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
      round(mean("b") - mean("a"), 6).as("mean_diff_cents"),
      round((mean("b") - mean("a")) /
        sqrt(variance("a") / d("n_a") + variance("b") / d("n_b")), 6)
        .as("welch_z"))
  }

  /** DuckDB replay of [[abTest]] — same moments, same IEEE op order. */
  val abTestOracleSql: String =
    """WITH c AS (
      |  SELECT user_id % 2 AS v,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS s_a,
      |    CAST(SUM(CASE WHEN v = 0 THEN c * c ELSE 0 END) AS BIGINT) AS q_a,
      |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS s_b,
      |    CAST(SUM(CASE WHEN v = 1 THEN c * c ELSE 0 END) AS BIGINT) AS q_b
      |  FROM c)
      |SELECT n_a, n_b, s_a, s_b,
      |  ROUND(CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a, 6)
      |    AS mean_diff_cents,
      |  ROUND((CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a) /
      |    sqrt(((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) *
      |             CAST(s_a AS DOUBLE) / n_a) / (CAST(n_a AS DOUBLE) - 1))
      |           / n_a +
      |         ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) *
      |             CAST(s_b AS DOUBLE) / n_b) / (CAST(n_b AS DOUBLE) - 1))
      |           / n_b), 6) AS welch_z
      |FROM m""".stripMargin

  /** DuckDB replay of [[cohortRetention]] — same integer week derivation. */
  val cohortOracleSql: String =
    """WITH wk AS (
      |  SELECT user_id,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
      |  FROM events),
      |first AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1),
      |grid AS (
      |  SELECT DISTINCT f.cohort_week, w.week - f.cohort_week AS week_offset,
      |    w.user_id
      |  FROM wk w JOIN first f ON w.user_id = f.user_id)
      |SELECT cohort_week, week_offset, COUNT(*) AS active_users
      |FROM grid GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin
}
