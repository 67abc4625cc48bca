package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (temporal) join — the canonical training-data feature-attachment
  * operator Spark lacks natively: for every left ("probe") row, attach the
  * latest right ("state") row of the same key with `right.time <=
  * left.time`.
  *
  * The naive formulations both die at scale: an inequality join
  * (`l.key = r.key AND l.t >= r.t` + per-probe max) expands to every
  * (probe, earlier-state) pair — quadratic per key — and a per-key
  * `collect_list` sort holds a whole key's history in one executor row.
  * This implementation is the linear one: tag each side, UNION them, and
  * run ONE window pass per key ordered by (time, side) where
  * `last(state_col, ignoreNulls)` carries the most recent state value
  * forward onto each probe row. Cost = one shuffle on the key + one sort —
  * the same price as a plain shuffled equi-join, independent of how many
  * state rows precede each probe. Ordering state rows BEFORE probe rows at
  * equal timestamps (`side` ascending) yields inclusive `>=` semantics,
  * matching ANSI/DuckDB `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Scale notes: the window partitions by key only, so one hyperactive key
  * serializes through a single task; for skewed keys, range-bucket the
  * timeline per key (salt = floor(t / bucket)) and as-of join within
  * buckets after carrying each bucket's closing state forward — the
  * standard two-pass fix. State rows must be unique per (key, time) for
  * the result to be well-defined (same requirement DuckDB's ASOF imposes);
  * callers pre-aggregate duplicates away.
  */
object AsOfJoin {

  /** Generic as-of join. `payload` = right-side columns to carry onto each
    * left row (emitted as `asof_<name>`); the right row's timestamp is
    * emitted as `asof_<time>`. Right must be unique per (key, time); both
    * inputs must contain `key` and `time`, and their other column names
    * must not collide (standard join hygiene).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           payload: Seq[String]): DataFrame = {
    val probe = left.withColumn("__side", lit(1))
    // a NULL-time state row can never satisfy `probe.t >= state.t` (ASOF
    // semantics: the comparison is unknown), but NULLS FIRST ordering
    // would make it visible to every probe — drop such rows up front.
    // Project the right side to exactly (key, time, payload) BEFORE the
    // union: any other right-side column would otherwise ride through
    // unionByName(allowMissingColumns) as an all-NULL column on every
    // probe row of the output
    val state = right.filter(col(time).isNotNull)
      .select((key +: time +: payload).map(col): _*)
      .withColumn("__side", lit(0))
    val tagged = probe.unionByName(state, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE packed struct per state row, carried atomically: per-column
    // last(ignoreNulls) calls would skip a NULL payload value and pair
    // the newest state's timestamp with an OLDER state's value — the
    // whole-row struct is never null on a state row, so the latest state
    // is taken as a unit even when some of its payload fields are NULL
    // (matching ASOF semantics)
    val packed = when(col("__side") === 0,
      struct((time +: payload).map(col): _*))
    val unpacked = tagged
      .withColumn("__asof", last(packed, ignoreNulls = true).over(w))
    val out = payload.foldLeft(
      unpacked.withColumn(s"asof_$time", col(s"__asof.$time"))
    ) { (d, c) => d.withColumn(s"asof_$c", col(s"__asof.$c")) }
    out.filter(col("__side") === 1)
      .drop("__side" +: "__asof" +: payload: _*)
  }

  /** Skew-resilient as-of join — the two-pass form for hot keys. `asOf`
    * partitions its window by key alone, so one hyperactive key's entire
    * history serializes through a single task. This variant partitions by
    * (key, time-bucket) instead and repairs cross-bucket visibility with a
    * carry-forward pass:
    *
    *  1. per (key, bucket): the bucket's CLOSING state (its latest state
    *     row) — a plain aggregate, fully parallel;
    *  2. per key over the DISTINCT bucket set (tiny: #buckets, not #rows):
    *     forward-fill each bucket's carry-in = the closing state of the
    *     latest earlier non-empty bucket. This is the only per-key-serial
    *     step, and it scales with time range / bucket width, independent
    *     of row count;
    *  3. per (key, bucket): the same union + last(ignoreNulls) window as
    *     `asOf`, with one synthetic carry-in state row injected at the
    *     bucket's start (side -1, so a real state at exactly the boundary
    *     still wins as the newer fact).
    *
    * Result is row-identical to `asOf` (equivalence-tested); the hot key's
    * work now spreads over (time-range / bucketUs) tasks. */
  def asOfBucketed(left: DataFrame, right: DataFrame, key: String,
                   time: String, payload: Seq[String],
                   bucketUs: Long = 86400L * 1000000L): DataFrame = {
    val bucket = floor(unix_micros(col(time)) / bucketUs).cast("long")
    val packed = struct((time +: payload).map(col): _*)

    val p = left.withColumn("__b", bucket)
    // NULL-time states never match (see asOf) and would land in a NULL
    // bucket of their own anyway; same (key, time, payload) projection
    // discipline as asOf — stray right columns must not leak as NULLs
    val s = right.filter(col(time).isNotNull)
      .select((key +: time +: payload).map(col): _*)
      .withColumn("__b", bucket)

    // 1. bucket-closing state; max over (time, payload…) struct = latest
    //    row (right is unique per (key, time) — the asOf contract)
    val closing = s.groupBy(col(key), col("__b"))
      .agg(max(packed).as("__close"))

    // 2. carry-in per occupied bucket: closing state of the latest
    //    STRICTLY EARLIER bucket, forward-filled over the distinct bucket
    //    set of both sides (probe-only buckets need a carry-in too)
    val buckets = p.select(col(key), col("__b"))
      .union(s.select(col(key), col("__b"))).distinct()
    val carryW = Window.partitionBy(key).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = buckets.join(closing, Seq(key, "__b"), "left")
      .withColumn("__carry", last(col("__close"), ignoreNulls = true).over(carryW))
      .filter(col("__carry").isNotNull)

    // 3. synthetic carry-in rows: sort position = the bucket's start with
    //    side -1 (before every real row); the carried ORIGINAL state
    //    timestamp rides along in __carry_t so asof_<time> reports the
    //    real state time, exactly as the plain asOf does
    val synth = payload.foldLeft(
      carry.select(col(key), col("__b"),
        timestamp_micros(col("__b") * bucketUs).as(time),
        col(s"__carry.$time").as("__carry_t"),
        col("__carry"))
    ) { (d, c) => d.withColumn(c, col(s"__carry.$c")) }
      .drop("__carry")
      .withColumn("__side", lit(-1))

    val probes = p.withColumn("__side", lit(1))
    val states = s.withColumn("__side", lit(0))
    val tagged = probes
      .unionByName(states, allowMissingColumns = true)
      .unionByName(synth, allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same atomic whole-row struct as asOf (see there): the latest state
    // must be taken as a unit even when payload fields are NULL; carry-in
    // rows contribute their ORIGINAL state time via __carry_t
    val packedRow = when(col("__side") === 0,
        struct((time +: payload).map(col): _*))
      .when(col("__side") === -1,
        struct(col("__carry_t").as(time) +: payload.map(col): _*))
    val unpacked = tagged
      .withColumn("__asof", last(packedRow, ignoreNulls = true).over(w))
    val out = payload.foldLeft(
      unpacked.withColumn(s"asof_$time", col(s"__asof.$time"))
    ) { (d, c) => d.withColumn(s"asof_$c", col(s"__asof.$c")) }
    out.filter(col("__side") === 1)
      .drop("__side" +: "__b" +: "__carry_t" +: "__asof" +: payload: _*)
  }

  /** The shared click/purchase prep both query variants run on — ONE copy
    * of the pre-aggregation contract (one purchase row per (user, ts))
    * that the as-of's well-definedness depends on. */
  private def clicksAndPurchases(spark: SparkSession,
                                 dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    (clicks, purchases)
  }

  private def attributionShape(joined: DataFrame): DataFrame =
    joined.select(col("user_id"), col("event_id"), col("ts"),
      col("asof_ts"), col("asof_p_value").as("asof_value"))

  /** The engine's as-of query: attach to every click event the user's most
    * recent purchase (timestamp + value) at click time — the "feature state
    * as of interaction time" join every training-data pipeline needs.
    * Clicks before a user's first purchase keep NULL state (left
    * semantics). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = clicksAndPurchases(spark, dir)
    attributionShape(asOf(clicks, purchases, "user_id", "ts", Seq("p_value")))
  }

  /** The same query through the skew-resilient two-pass path (6h buckets)
    * — driver-gated against the identical DuckDB ASOF oracle, so the
    * carry-forward rewrite is hash-verified, not just equivalence-tested. */
  def querySkew(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = clicksAndPurchases(spark, dir)
    attributionShape(asOfBucketed(clicks, purchases, "user_id", "ts",
      Seq("p_value"), bucketUs = 6L * 3600L * 1000000L))
  }
}
