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
    val state = right.withColumn("__side", lit(0))
    val tagged = probe.unionByName(state, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stateTime = when(col("__side") === 0, col(time))
    val enriched = payload.foldLeft(
      tagged.withColumn(s"asof_$time", last(stateTime, ignoreNulls = true).over(w))
    ) { (d, c) =>
      // payload cols are null on probe rows (allowMissingColumns), so
      // last(ignoreNulls) only ever picks up genuine state values
      d.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    enriched.filter(col("__side") === 1).drop("__side" +: payload: _*)
  }

  /** The engine's as-of query: attach to every click event the user's most
    * recent purchase (timestamp + value) at click time — the "feature state
    * as of interaction time" join every training-data pipeline needs.
    * Clicks before a user's first purchase keep NULL state (left
    * semantics). Purchases are pre-aggregated to one row per (user, ts) so
    * the as-of result is well-defined at any SF. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    asOf(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("asof_ts"), col("asof_p_value").as("asof_value"))
  }
}
