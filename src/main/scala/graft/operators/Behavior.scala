package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Epoch-day of an event timestamp — the ONE definition all operators
    * (and their oracle twins' datediff('day', DATE '1970-01-01', ...))
    * in this file share; a per-site transcription slip would type-drift
    * that operator against its oracle. */
  private def epochDay(ts: Column): Column =
    datediff(ts.cast(DateType), lit("1970-01-01").cast(DateType))
      .cast(LongType)

  /** Exact integer cents of a money double — the file-wide twin of the
    * oracles' CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT). */
  private def cents(value: Column): Column =
    (value.cast(DecimalType(18, 2)) * 100).cast(LongType)

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
    funnelFrom(Tables.events(spark, dir))

  /** Core of [[funnel]] over any (user_id, ts, event_type) frame. */
  def funnelFrom(ev: DataFrame): DataFrame = {
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
        (epochDay(col("ts")) / 7).cast(LongType).as("week"))
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
        cents(col("value")).as("cents"))
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
        cents(col("value")).as("c"))
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

  /** Activity-streak distribution (gaps-and-islands): a user's streak is a
    * maximal run of CONSECUTIVE active calendar days; the report counts
    * users by their longest streak. Islands via the classic
    * `day − row_number` invariant — constant within a consecutive run,
    * strictly increasing across a gap — over exact epoch-day integers (no
    * calendar/locale dependence).
    *
    * Scale shape: the distinct (user, day) grid collapses the event volume
    * first (map-side combinable); the per-user window then sorts ≤ span-days
    * rows per user — millions of small independent partitions after one hash
    * exchange, the [[attribution]] discipline — and the two closing
    * aggregates are bounded by users resp. span-days. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("epoch_day")
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        epochDay(col("ts")).as("epoch_day"))
      .distinct()
    days
      .withColumn("island",
        col("epoch_day") - row_number().over(w).cast(LongType))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("max_streak"))
      .groupBy("max_streak").agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }

  /** DuckDB replay of [[streaks]] — same epoch-day islands. */
  val streaksOracleSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS epoch_day
      |  FROM events),
      |isl AS (
      |  SELECT user_id, epoch_day,
      |    epoch_day - ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_day) AS island
      |  FROM days),
      |st AS (SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY 1, 2),
      |mu AS (SELECT user_id, MAX(len) AS max_streak FROM st GROUP BY 1)
      |SELECT max_streak, COUNT(*) AS n_users FROM mu
      |GROUP BY 1 ORDER BY max_streak""".stripMargin

  /** First-order Markov transition matrix over each user's event sequence:
    * exact transition counts per (prev_type → next_type) plus the row-
    * normalized probability — the next-event model product analytics and
    * session-synthesis pipelines both ask for. Sequence order is the same
    * total order every sequential operator here uses: (ts, event_id).
    *
    * Exactness: counts are BIGINT; the probability is ONE double division
    * of two exact counts, rounded, replayed identically in the oracle (the
    * normalizer is a window sum over the ≤ |types|² count table, not the
    * event stream).
    *
    * Scale shape: one per-user LAG window (small independent partitions,
    * one hash exchange — no event list materializes anywhere), one
    * map-side-combinable count aggregate, then windows over a bounded
    * (|types|²-row) table. */
  def markov(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wp = Window.partitionBy("prev_type")
    counts
      .withColumn("p", round(
        col("n").cast(DoubleType) /
          sum(col("n")).over(wp).cast(DoubleType), 6))
      .orderBy("prev_type", "next_type")
  }

  /** DuckDB replay of [[markov]] — same (ts, event_id) sequence order. */
  val markovOracleSql: String =
    """WITH tr AS (
      |  SELECT event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  ROUND(CAST(n AS DOUBLE) /
      |    CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
      |FROM c ORDER BY prev_type, next_type""".stripMargin

  /** Events within a session path (path truncation depth): the first 8
    * events name the session's shape; the tail of a marathon session adds
    * length, not identity. Keeps per-session path state bounded at any
    * event volume. */
  private[graft] val PathMaxEvents = 8

  /** Top session paths reported (total order, TakeOrderedAndProject). */
  private[graft] val TopPaths = 25

  /** Session gap: 30 min of inactivity closes a session — the SAME
    * threshold and `>= gap` boundary semantics as `session_window(ts,
    * "30 minutes")` (EventWindows.sessions / Streaming.streamSessions),
    * so all three sessionizers agree on what a session IS (equality
    * spec'd in BehaviorSpec). */
  private[graft] val SessionGapUs = 30L * 60L * 1000000L

  /** Session-path mining — the flow-analysis operator behind "what do
    * users DO in a session": sessionize each user's event stream
    * (gaps-and-islands, 30-min inactivity gap), name each session by its
    * path = the '>'-joined sequence of its first [[PathMaxEvents]] event
    * types, then group the sessions BY PATH — clustering by exact
    * behavioral signature — and report the top [[TopPaths]] paths with
    * session/user counts, how many converted (a purchase anywhere in the
    * FULL session, not just the truncated head), and the longest session
    * carrying the path.
    *
    * Exactness: sessionization compares integer epoch-micros (`>= gap`,
    * mirroring session_window's boundary); the path string is built from
    * the same (ts, event_id) total order on both engines (collect_list
    * of rn-keyed structs sorted ≡ string_agg ORDER BY rn — both skip the
    * NULLs the rn-cap injects); all outputs are BIGINTs except one
    * rounded IEEE division (the markov-p pattern).
    *
    * Scale shape (100 TB discipline): the three per-user window passes
    * (lag, running sum, row_number) share ONE hash exchange on user_id —
    * small independent partitions, the markov/streaks discipline; the
    * per-session state is ≤ 8 path entries + 2 counters (the rn cap
    * nulls everything past 8 BEFORE collect_list, so no session
    * materializes its event list); the path aggregate is map-side
    * combinable and the top-k is TakeOrderedAndProject under a total
    * order, never a global sort of the path dictionary. */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    sessionPathsOf(Tables.events(spark, dir))

  /** [[sessionPaths]] over an arbitrary (user_id, ts, event_id,
    * event_type) frame — split out (the *Of discipline) so BehaviorSpec
    * can plant a session LONGER than [[PathMaxEvents]]: the testdata's
    * longest session is 3 events, so the rn-cap truncation and the
    * conversion-from-the-FULL-session rule were otherwise dead branches
    * in every gate. */
  def sessionPathsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts"))
    val marked = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("brk",
        when(lag(us, 1).over(wOrd).isNull ||
          us - lag(us, 1).over(wOrd) >= SessionGapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")))
    val sessions = marked.groupBy("user_id", "sid")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("rn") <= PathMaxEvents,
            struct(col("rn"), col("event_type"))))),
          x => x.getField("event_type")), ">").as("path"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        count(lit(1)).as("len"))
    sessions.groupBy("path")
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("conv")).as("n_conv"),
        max(col("len")).as("max_len"))
      .withColumn("conv_share", round(
        col("n_conv").cast(DoubleType) / col("n_sessions").cast(DoubleType),
        6))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(TopPaths)
  }

  /** DuckDB replay of [[sessionPaths]] — same integer-micros gap rule,
    * same (ts, event_id) order, same rn-capped path (string_agg skips the
    * CASE's NULLs exactly as collect_list does). */
  val sessionPathsOracleSql: String =
    s"""WITH b AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
       |              >= $SessionGapUs
       |    THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM b),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
       |    ORDER BY ts, event_id) AS rn
       |  FROM s),
       |sess AS (
       |  SELECT user_id, sid,
       |    string_agg(CASE WHEN rn <= $PathMaxEvents THEN event_type END,
       |      '>' ORDER BY rn) AS path,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
       |    COUNT(*) AS len
       |  FROM r GROUP BY 1, 2)
       |SELECT path, COUNT(*) AS n_sessions,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(conv) AS BIGINT) AS n_conv,
       |  CAST(MAX(len) AS BIGINT) AS max_len,
       |  ROUND(CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS conv_share
       |FROM sess GROUP BY 1
       |ORDER BY n_sessions DESC, path ASC LIMIT $TopPaths""".stripMargin

  /** Chi-square independence table for event_type × the planted [[abTest]]
    * assignment (variant = user_id % 2): per-cell observed BIGINT count,
    * expected count under independence, and the cell's χ² contribution —
    * the categorical counterpart of [[abTest]]'s two-sample z.
    *
    * Exactness: all marginals are exact BIGINT window sums over the
    * ≤ |types|·2 cell table; expected and the contribution drop to double
    * in ONE shared expression shape — e = r·c/t, contrib = (o−e)²/e —
    * written identically in the oracle, then rounded.
    *
    * Scale shape: one map-side-combinable count aggregate over the stream;
    * everything after operates on the bounded cell table. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("user_id") % 2).cast(LongType).as("variant"))
      .groupBy("event_type", "variant")
      .agg(count(lit(1)).as("observed"))
    val wr = Window.partitionBy("event_type")
    val wc = Window.partitionBy("variant")
    // global window over a BOUNDED table only: |event_type| × 2 cells
    val wt = Window.partitionBy()
    def d(c: Column) = c.cast(DoubleType)
    val withMargins = cells
      .withColumn("row_total", sum(col("observed")).over(wr))
      .withColumn("col_total", sum(col("observed")).over(wc))
      .withColumn("total", sum(col("observed")).over(wt))
    val e = d(col("row_total")) * d(col("col_total")) / d(col("total"))
    withMargins
      .select(col("event_type"), col("variant"), col("observed"),
        round(e, 6).as("expected"),
        round((d(col("observed")) - e) * (d(col("observed")) - e) / e, 6)
          .as("contrib"))
      .orderBy("event_type", "variant")
  }

  /** DuckDB replay of [[chiSquare]] — same margins, same IEEE shape. */
  val chiSquareOracleSql: String =
    """WITH cells AS (
      |  SELECT event_type, user_id % 2 AS variant, COUNT(*) AS observed
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, variant, observed,
      |    SUM(observed) OVER (PARTITION BY event_type) AS r,
      |    SUM(observed) OVER (PARTITION BY variant) AS c,
      |    SUM(observed) OVER () AS t
      |  FROM cells)
      |SELECT event_type, variant, observed,
      |  ROUND(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE), 6)
      |    AS expected,
      |  ROUND((CAST(observed AS DOUBLE) -
      |      CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) *
      |    (CAST(observed AS DOUBLE) -
      |      CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) /
      |    (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 6)
      |    AS contrib
      |FROM m ORDER BY event_type, variant""".stripMargin

  /** Time-weighted value averages per event type: each event's value is
    * weighted by how long it remained the user's CURRENT state — the exact
    * micros until the user's next event. The last event of every user has
    * no successor and carries no weight (a production run would close it at
    * the watermark; the batch form keeps the oracle exact). The metric
    * every pricing/telemetry warehouse wants when sampling is irregular —
    * a plain AVG over-weights burst periods.
    *
    * Exactness: weights are exact BIGINT micros (LEAD over the same
    * (ts, event_id) order), values exact cents; each w·c TERM multiplies
    * as DECIMAL(19,0)×DECIMAL(19,0) — a Long product would already wrap
    * at a multi-year gap × max-cents term (~9e18 > 2⁶³−1), silently on
    * the non-ANSI Spark side — and the sum accumulates as DECIMAL(38,0)
    * (bounded: both factors < 2⁶³ ⇒ product < 8.5e37). The average drops
    * to double in ONE division, rounded, identical in the oracle (HUGEINT
    * product — the q_gini discipline).
    *
    * Scale shape: one per-user LEAD window, then one map-side-combinable
    * aggregate over ≤ |types| groups. */
  def timeWeighted(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        cents(col("value")).as("cents"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("w_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("w_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("w_us")).as("dur_us"),
        round(
          sum(col("w_us").cast(DecimalType(19, 0)) *
              col("cents").cast(DecimalType(19, 0)))
            .cast(DoubleType) /
            sum(col("w_us")).cast(DoubleType), 6).as("twa_cents"))
      .orderBy("event_type")
  }

  /** DuckDB replay of [[timeWeighted]] — same micros weights. */
  val timeWeightedOracleSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) - epoch_us(ts) AS w_us
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(w_us) AS BIGINT) AS dur_us,
      |  ROUND(CAST(SUM(CAST(w_us AS HUGEINT) * CAST(cents AS HUGEINT))
      |      AS DOUBLE) /
      |    CAST(SUM(w_us) AS DOUBLE), 6) AS twa_cents
      |FROM t WHERE w_us IS NOT NULL
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Per-day peak concurrency: each user's activity on a calendar day is
    * an interval [first event, last event]; the report gives the maximum
    * number of simultaneously-active users per day — the interval-sweep
    * (+1/−1 endpoint) peak every capacity planner asks for.
    *
    * Tie semantics are part of the contract: endpoints sort by
    * (micros, delta DESC) — starts before ends at the same instant, so
    * touching intervals count as concurrent, and a single-event user
    * (s == e) contributes a momentary 1. The running sum uses the ANSI
    * default RANGE frame, so all peers at one sort key share one
    * cumulative value — the result is independent of intra-tie row order
    * on ANY engine.
    *
    * Scale shape: the event stream collapses to the (user, day) interval
    * grid first (map-side combinable); the sweep windows are partitioned
    * BY DAY — bounded by active-users-per-day, never a global single-task
    * sort. A hot day at 100 TB splits by contiguous TIME sub-ranges, not
    * a user-hash salt: peak concurrency is NOT associative across a
    * user split (two per-salt peaks of 1 can be a true peak of 2 when
    * the intervals overlap), but it IS decomposable along time — range-
    * sort the ±1 endpoint stream, compute each sub-range's running sum
    * and total delta, prefix-sum the totals, and the day's peak is
    * max over sub-ranges of (carry-in offset + local peak) — the same
    * distributed prefix-sum machinery as ntile/seq_pack. */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(spark, dir)
      .select(col("user_id"),
        epochDay(col("ts")).as("epoch_day"),
        unix_micros(col("ts")).as("us"))
      .groupBy("user_id", "epoch_day")
      .agg(min("us").as("s"), max("us").as("e"))
    val pts = iv.select(col("epoch_day"), col("s").as("us"),
        lit(1L).as("delta"))
      .unionByName(iv.select(col("epoch_day"), col("e").as("us"),
        lit(-1L).as("delta")))
    val w = Window.partitionBy("epoch_day")
      .orderBy(col("us").asc, col("delta").desc)
    pts
      .withColumn("run", sum(col("delta")).over(w))
      .groupBy("epoch_day")
      .agg((count(lit(1)) / 2).cast(LongType).as("n_users"),
        max(col("run")).as("peak"))
      .orderBy("epoch_day")
  }

  /** DuckDB replay of [[concurrency]] — same RANGE-frame tie semantics. */
  val concurrencyOracleSql: String =
    """WITH iv AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS epoch_day,
      |    MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      |  FROM events GROUP BY 1, 2),
      |pts AS (
      |  SELECT epoch_day, s AS us, CAST(1 AS BIGINT) AS delta FROM iv
      |  UNION ALL
      |  SELECT epoch_day, e AS us, CAST(-1 AS BIGINT) AS delta FROM iv),
      |sweep AS (
      |  SELECT epoch_day,
      |    SUM(delta) OVER (PARTITION BY epoch_day
      |      ORDER BY us ASC, delta DESC) AS run
      |  FROM pts)
      |SELECT epoch_day, CAST(COUNT(*) / 2 AS BIGINT) AS n_users,
      |  CAST(MAX(run) AS BIGINT) AS peak
      |FROM sweep GROUP BY 1 ORDER BY epoch_day""".stripMargin

  /** DAU/WAU stickiness: daily active users, trailing-7-day weekly active
    * users, and their ratio — THE product-engagement gauge. WAU avoids the
    * per-day range join entirely: each (user, day) grid cell fans out to
    * the 7 report days it supports via explode(sequence) — a narrow ×7
    * projection — and a distinct count lands per day. Report days are
    * clipped to the observed range so warm-up days (whose trailing window
    * precedes the data) don't emit short windows; the report spine is the
    * WAU side, so a full-outage day inside the range emits
    * (dau = 0, stickiness = 0) instead of silently vanishing — the day
    * an engagement gauge exists to surface.
    *
    * Scale shape: the event stream collapses to the distinct (user, day)
    * grid first; the fan-out is constant (×7) on the GRID (users × days),
    * not the event volume; both counts are map-side-combinable distinct
    * aggregates. Counts exact; the ratio is one rounded IEEE division. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .select(col("user_id"),
        epochDay(col("ts")).as("epoch_day"))
      .distinct()
    val bounds = grid.agg(min("epoch_day").as("lo"), max("epoch_day").as("hi"))
    val dau = grid.groupBy("epoch_day")
      .agg(count(lit(1)).as("dau"))
    val wau = grid
      .select(col("user_id"),
        explode(sequence(col("epoch_day"), col("epoch_day") + 6)).as("day"))
      .distinct()
      .groupBy(col("day").as("epoch_day"))
      .agg(count(lit(1)).as("wau"))
    // spine = wau (every day inside some user's trailing window), dau
    // LEFT-joined: a full-outage day inside the clipped range must emit
    // (dau = 0, wau > 0, stickiness = 0) — the day an engagement gauge
    // exists to surface — not silently vanish from the report
    wau.join(dau, Seq("epoch_day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("epoch_day") >= col("lo") + 6 && col("epoch_day") <= col("hi"))
      .select(col("epoch_day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        round(coalesce(col("dau"), lit(0L)).cast(DoubleType) /
          col("wau").cast(DoubleType), 6).as("stickiness"))
      .orderBy("epoch_day")
  }

  /** DuckDB replay of [[stickiness]] — same grid fan-out and clipping. */
  val stickinessOracleSql: String =
    """WITH grid AS (
      |  SELECT DISTINCT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS epoch_day
      |  FROM events),
      |b AS (SELECT MIN(epoch_day) AS lo, MAX(epoch_day) AS hi FROM grid),
      |dau AS (
      |  SELECT epoch_day, COUNT(*) AS dau FROM grid GROUP BY 1),
      |wau AS (
      |  SELECT day AS epoch_day, COUNT(DISTINCT user_id) AS wau FROM (
      |    SELECT user_id,
      |      unnest(generate_series(epoch_day, epoch_day + 6)) AS day
      |    FROM grid) GROUP BY 1)
      |SELECT w.epoch_day, CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau, w.wau,
      |  ROUND(CAST(COALESCE(d.dau, 0) AS DOUBLE) / CAST(w.wau AS DOUBLE), 6)
      |    AS stickiness
      |FROM wau w LEFT JOIN dau d ON d.epoch_day = w.epoch_day, b
      |WHERE w.epoch_day >= b.lo + 6 AND w.epoch_day <= b.hi
      |ORDER BY w.epoch_day""".stripMargin

  /** Time-bound conversion: the fraction of purchases preceded by a view
    * from the SAME user within the attribution window (1 hour) — the
    * bounded-lookback complement of [[funnel]] (any-order-time) and
    * [[attribution]] (unbounded carry-forward). Exact micros window, half
    * -open on the lower edge by ≥: a view at exactly t−1h converts.
    *
    * Shape: a LEFT SEMI join — purchases against views on the user-id
    * EQUI key with the interval as a join-side range predicate, so the
    * pair fan-out is bounded by per-user activity (never cross-user), one
    * hash shuffle each side. Rate = exact counts, one rounded division.
    *
    * Scale: at 100 TB the same plan holds — user-keyed equi join with
    * AQE skew splitting; a hot user bounds its own pair count by its own
    * event rate times the window. */
  def conversionWindow(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 3600L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        epochDay(col("ts")).as("epoch_day"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("epoch_day"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("us").as("v_us"))
    val converted = purchases.join(views,
      col("user_id") === col("v_user") &&
        col("v_us") >= col("us") - WindowUs && col("v_us") <= col("us"),
      "left_semi")
    val perDay = purchases.groupBy("epoch_day")
      .agg(count(lit(1)).as("n_purchases"))
    val convDay = converted.groupBy("epoch_day")
      .agg(count(lit(1)).as("n_converted"))
    perDay.join(convDay, Seq("epoch_day"), "left")
      .select(col("epoch_day"), col("n_purchases"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        round(coalesce(col("n_converted"), lit(0L)).cast(DoubleType) /
          col("n_purchases").cast(DoubleType), 6).as("conv_rate"))
      .orderBy("epoch_day")
  }

  /** DuckDB replay of [[conversionWindow]] — same micros window. */
  val conversionWindowOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS epoch_day
      |  FROM events),
      |p AS (SELECT user_id, us, epoch_day FROM ev
      |      WHERE event_type = 'purchase'),
      |conv AS (
      |  SELECT p.epoch_day, COUNT(*) AS n_converted FROM p
      |  WHERE EXISTS (
      |    SELECT 1 FROM ev v
      |    WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |      AND v.us >= p.us - 3600000000 AND v.us <= p.us)
      |  GROUP BY 1),
      |tot AS (SELECT epoch_day, COUNT(*) AS n_purchases FROM p GROUP BY 1)
      |SELECT t.epoch_day, t.n_purchases,
      |  COALESCE(c.n_converted, 0) AS n_converted,
      |  ROUND(CAST(COALESCE(c.n_converted, 0) AS DOUBLE) /
      |    CAST(t.n_purchases AS DOUBLE), 6) AS conv_rate
      |FROM tot t LEFT JOIN conv c ON t.epoch_day = c.epoch_day
      |ORDER BY t.epoch_day""".stripMargin

  // -- numeric distribution drift ----------------------------------------

  /** Numeric value-distribution drift between two time cohorts — the
    * monitoring gauge that catches a payment-amount or score distribution
    * shifting between ingest periods ([[graft.operators.TextAnalysis.langDrift]]
    * is the categorical twin; this is the numeric one). Events split at the
    * data-derived midpoint day (first half vs second half of the observed
    * range); `value` buckets into floor-log₂ bins of exact DECIMAL cents —
    * the `length(bin(c))` idiom, NO libm transcendental near the hash gate
    * — and each bin reports both cohorts' counts, IEEE-division shares and
    * the total-variation-distance contribution in EXACT integer arithmetic:
    * |n_a·tb − n_b·ta| over the common denominator ta·tb. ½·Σ num/(ta·tb)
    * is the exact TVD — integer-summable downstream with no float drift.
    *
    * Exactness: counts/products are BIGINTs (products fit while cohort
    * counts stay < 3·10⁹; past that the same query runs with DECIMAL(38,0)
    * products); shares are one correctly-rounded IEEE division each,
    * identical on both engines, rounded at 6 dp.
    *
    * Scale shape: ONE scan → narrow projection (bin derivation is
    * per-row integer ops) → map-side-combinable conditional count per
    * bin; the window totals run over the ≤64-row bin table. */
  def valueDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        epochDay(col("ts")).as("d"),
        cents(col("value")).as("c"))
    val mid = ev.agg(
      expr("min(d) + (max(d) - min(d) + 1) div 2").cast(LongType).as("mid"))
    val binned = ev.crossJoin(broadcast(mid))
      .select(
        when(col("c").isNull, lit(-1L))
          .when(col("c") <= 0L, lit(0L))
          .otherwise(length(bin(col("c"))).cast(LongType)).as("bin"),
        (col("d") < col("mid")).as("is_a"))
      .groupBy("bin")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    // global window over a BOUNDED table only: one row per magnitude bin
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    binned
      .withColumn("ta", sum(col("n_a")).over(w))
      .withColumn("tb", sum(col("n_b")).over(w))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("n_a").cast(DoubleType) / col("ta").cast(DoubleType), 6)
          .as("share_a"),
        round(col("n_b").cast(DoubleType) / col("tb").cast(DoubleType), 6)
          .as("share_b"),
        abs(col("n_a") * col("tb") - col("n_b") * col("ta")).as("tvd_num"))
      .orderBy("bin")
  }

  /** DuckDB replay of [[valueDrift]] — same midpoint, bins and integers. */
  val valueDriftOracleSql: String =
    """WITH ev AS (
      |  SELECT
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |mid AS (
      |  SELECT CAST(MIN(d) + (MAX(d) - MIN(d) + 1) // 2 AS BIGINT) AS mid
      |  FROM ev),
      |b AS (
      |  SELECT CASE WHEN c IS NULL THEN -1
      |              WHEN c <= 0 THEN 0
      |              ELSE CAST(length(bin(c)) AS BIGINT) END AS bin,
      |    d < mid.mid AS is_a
      |  FROM ev, mid),
      |g AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM b GROUP BY 1),
      |t AS (
      |  SELECT bin, n_a, n_b,
      |    SUM(n_a) OVER () AS ta, SUM(n_b) OVER () AS tb
      |  FROM g)
      |SELECT bin, n_a, n_b,
      |  ROUND(CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS share_a,
      |  ROUND(CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS share_b,
      |  CAST(ABS(n_a * tb - n_b * ta) AS BIGINT) AS tvd_num
      |FROM t ORDER BY bin""".stripMargin

  // -- robust series anomaly detection -----------------------------------

  /** Robust anomaly detection over the GLOBAL daily event-volume series —
    * the monitoring alarm that catches an ingest outage or a runaway
    * producer without a clean day's noise tripping it: each day's total
    * event count is compared against the series median via the
    * 3·1.4826·MAD robust fence ([[graft.operators.Relational.madOutliers]]'s
    * gauge applied to a time series; a per-event_type variant would
    * simply add event_type to the groupBy key and partition the stats —
    * the oracle and this operator both run at the global-day grain).
    * MAD is contamination-robust, which
    * is the point: the anomalous days themselves cannot drag the fence
    * toward themselves the way a σ-based control chart's would.
    *
    * The synthetic series is clean at every SF (max deviation ~0.85× the
    * fence), so a planted outage keeps the alarm branch data-exercised —
    * and oracle-gated — rather than vacuous: on days ≡ 5 (mod 16), only
    * a quarter of the volume (event_id ≡ 0 mod 4) survives before
    * counting — the same plant discipline as resampleFfill's outage and
    * DqChecks' FK hole. Verified at all three SFs: exactly the two
    * planted days flag, no clean day does.
    *
    * Exactness: counts are BIGINTs; the R-7 median/MAD of integer counts
    * are exact binary doubles; the fence product folds identically on
    * both engines (madOutliers' proven shape).
    *
    * Scale shape: ONE map-side-combinable daily count; every pass after
    * runs on the days-sized table — bounded by the calendar, not event
    * volume. */
  def seriesAnomaly(spark: SparkSession, dir: String): DataFrame = {
    // r20: the daily frame is consumed by the median aggregate AND the
    // deviation projection (which itself feeds the MAD aggregate and the
    // final output) — recompute-shaped, the events scan + daily count ran
    // three times per query. A lazy localCheckpoint materializes it once;
    // the frame is CALENDAR-bounded (one row per day — 30 at sf0.1, a few
    // thousand at any horizon), so the state is trivially safe at scale.
    // Measured 0.85 → 0.55 s isolated warm at sf0.1 (DevProbe 5-run
    // medians). The two medians stay on the built-in percentile: they run
    // over this days-sized frame, where the r19/r20 flat-buffer argument
    // has nothing to win (the VERDICT item-7 re-check, measured at sf0.1:
    // 30 input rows).
    val daily = Tables.events(spark, dir)
      .select(col("event_id"),
        epochDay(col("ts")).as("d"))
      .filter(!(col("d") % 16 === 5 && col("event_id") % 4 =!= 0))
      .groupBy("d").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val med = daily.agg(expr("percentile(CAST(n AS DOUBLE), 0.5)").as("med"))
    val dev = daily.crossJoin(broadcast(med))
      .select(col("d"), col("n"), col("med"),
        abs(col("n").cast(DoubleType) - col("med")).as("dev"))
    val mad = dev.agg(expr("percentile(CAST(dev AS DOUBLE), 0.5)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("d").as("epoch_day"), col("n"),
        round(col("med"), 4).as("median"),
        round(col("mad"), 4).as("mad"),
        (col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .cast(LongType).as("is_anomaly"))
      .orderBy("epoch_day")
  }

  /** Level-shift (changepoint) detection on the daily event-volume
    * series — the complement of [[seriesAnomaly]]'s spike alarm: a
    * two-sided 7-day window mean comparison per day, flagging days where
    * the regime after differs from the regime before by more than 15% of
    * the series median. The synthetic series is level at every SF, so a
    * planted outage — 30% of volume (event_id mod 10 < 3) dropped from
    * the data-derived midpoint day onward — creates a true level shift;
    * the detector's maximum-score day must be exactly that midpoint
    * (pinned in the spec), and only days whose windows straddle the
    * shift may flag.
    *
    * Exactness: window sums/counts are exact BIGINTs over RANGE frames
    * on the integer epoch-day (the moving_avg calendar discipline);
    * each mean is one IEEE division; the flag compares unrounded
    * doubles built by the same fold on both engines.
    *
    * Scale shape: ONE map-side-combinable daily count; both RANGE
    * windows and the median run over the days-sized table — bounded by
    * the calendar, not event volume (the global-order window is over
    * that bounded table, the sanctioned shape). */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"),
        epochDay(col("ts")).as("d"))
    val mid = ev.agg(
      expr("min(d) + (max(d) - min(d) + 1) div 2").cast(LongType).as("mid"))
    val daily = ev.crossJoin(broadcast(mid))
      .filter(!(col("d") >= col("mid") && col("event_id") % 10 < 3))
      .groupBy("d").agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.expressions.Window
    val med = daily.agg(expr("percentile(CAST(n AS DOUBLE), 0.5)").as("med"))
    val wB = Window.orderBy("d").rangeBetween(-7, -1)
    val wA = Window.orderBy("d").rangeBetween(0, 6)
    daily
      .withColumn("nb", count(col("n")).over(wB))
      .withColumn("sb", sum(col("n")).over(wB))
      .withColumn("na", count(col("n")).over(wA))
      .withColumn("sa", sum(col("n")).over(wA))
      .filter(col("nb") === 7L && col("na") === 7L)
      .crossJoin(broadcast(med))
      .select(col("d").as("epoch_day"), col("n"),
        round(col("sb").cast(DoubleType) / col("nb").cast(DoubleType), 4)
          .as("mean_before"),
        round(col("sa").cast(DoubleType) / col("na").cast(DoubleType), 4)
          .as("mean_after"),
        (abs(col("sa").cast(DoubleType) / col("na").cast(DoubleType) -
          col("sb").cast(DoubleType) / col("nb").cast(DoubleType)) >
          lit(0.15) * col("med")).cast(LongType).as("is_shift"))
      .orderBy("epoch_day")
  }

  /** DuckDB replay of [[changepoint]] — same plant, frames and flag. */
  val changepointOracleSql: String =
    """WITH ev AS (
      |  SELECT event_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d
      |  FROM events),
      |mid AS (
      |  SELECT CAST(MIN(d) + (MAX(d) - MIN(d) + 1) // 2 AS BIGINT) AS mid
      |  FROM ev),
      |daily AS (
      |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM ev, mid
      |  WHERE NOT (d >= mid.mid AND event_id % 10 < 3)
      |  GROUP BY 1),
      |med AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS med
      |        FROM daily),
      |win AS (
      |  SELECT d, n,
      |    COUNT(n) OVER (ORDER BY d
      |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS nb,
      |    SUM(n) OVER (ORDER BY d
      |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sb,
      |    COUNT(n) OVER (ORDER BY d
      |      RANGE BETWEEN CURRENT ROW AND 6 FOLLOWING) AS na,
      |    SUM(n) OVER (ORDER BY d
      |      RANGE BETWEEN CURRENT ROW AND 6 FOLLOWING) AS sa
      |  FROM daily)
      |SELECT d AS epoch_day, n,
      |  ROUND(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 4) AS mean_before,
      |  ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 4) AS mean_after,
      |  CAST(ABS(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
      |           CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) >
      |    0.15 * med.med AS BIGINT) AS is_shift
      |FROM win, med
      |WHERE nb = 7 AND na = 7
      |ORDER BY epoch_day""".stripMargin

  /** DuckDB replay of [[seriesAnomaly]] — same plant, medians and fence. */
  val seriesAnomalyOracleSql: String =
    """WITH daily AS (
      |  SELECT
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events
      |  WHERE NOT (datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |               % 16 = 5
      |             AND event_id % 4 <> 0)
      |  GROUP BY 1),
      |med AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS med
      |        FROM daily),
      |dev AS (
      |  SELECT d, n, med, abs(CAST(n AS DOUBLE) - med) AS dev
      |  FROM daily, med),
      |mad AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
      |SELECT d AS epoch_day, n, ROUND(med, 4) AS median,
      |  ROUND(mad.mad, 4) AS mad,
      |  CAST(dev > 3.0 * 1.4826 * mad.mad AS BIGINT) AS is_anomaly
      |FROM dev, mad
      |ORDER BY epoch_day""".stripMargin

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
