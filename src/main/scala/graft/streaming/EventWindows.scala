package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time window aggregations over `events` (SURVEY.md §2.10 / §7.1(7)).
  *
  * The reference is strictly batch; these are the window-group queries the
  * testdata's `events` stream table exists for. Expressed with the same
  * `window()`/`session_window()` operators Structured Streaming uses, run
  * here in batch mode so every one is DuckDB-oracle-checkable; the
  * readStream variant of the tumbling agg lives in `Streaming` and is
  * covered by a MemoryStream test.
  *
  * Window starts are emitted as formatted strings, and the exact decimal
  * sums as BIGINT cents: parquet physical encodings of timestamps (µs vs
  * ns) and decimals (FLBA vs int128) differ between engines, and the driver
  * hash covers the physical type; int64 is representation-stable.
  */
object EventWindows {

  private val dec = org.apache.spark.sql.types.DecimalType(18, 2)

  /** Exact decimal sum of `value`, emitted as integral cents. */
  private[streaming] def sumValueCents =
    (sum(col("value").cast(dec)) * 100)
      .cast(org.apache.spark.sql.types.LongType).as("sum_value_cents")

  /** Tumbling 1-hour windows: count + sum(value) per (window, event_type). */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // decimal sum: exact and order-independent at any parallelism
      .agg(count(lit(1)).as("cnt"), sumValueCents)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value_cents"))
      .orderBy("hour_start", "event_type")

  /** Sliding 2-hour windows every 1 hour: each event lands in 2 windows. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("cnt"), sumValueCents)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        // exact decimal sum, not a rounded average: a derived avg double can
        // land on a .xxxx5 tie that engines round differently
        col("cnt"), col("sum_value_cents"))
      .orderBy("win_start")

  /** Session windows: 30-minute inactivity gap per user; emits
    * (user, session start, events, span). The batch equivalent of
    * `session_window` state merging — oracle-checked against a DuckDB
    * gaps-and-islands rewrite. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("cnt"))
      .orderBy("user_id", "session_start")
}
