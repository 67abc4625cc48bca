package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed range (interval) join — the scale-safe form of
  * `probe.key = ivl.key AND probe.t BETWEEN ivl.start AND ivl.end`.
  *
  * Catalyst executes that predicate as an equi-join on `key` with the
  * range as a post-join residual, which is correct but quadratic PER KEY:
  * a hot key with p probes and i intervals materializes p·i pairs before
  * the filter — the classic interval-join blow-up. Refining the join key
  * with a coarse time bucket (`floor(t / bucket)` on the probe; each
  * interval exploded to every bucket it overlaps) bounds the expansion to
  * pairs that are already within one bucket of each other in time: join on
  * (key, bucket), then apply the exact range residual. With bucket width ≥
  * the max interval length each interval covers ≤ 2 buckets, so the
  * build side at most doubles — while the per-key pair count drops from
  * p·i to only the near-in-time pairs. Each probe carries exactly ONE
  * bucket, so no pair can match twice and no dedup pass is needed.
  *
  * This is the same discipline as the LSH band join (Dedup) and the geo
  * grid join (GeoJoin): turn a non-equi predicate into an equi-join on a
  * derived coarse key plus an exact residual filter.
  */
object RangeJoin {

  private val DayUs = 86400L * 1000000L

  private def bucketOf(t: Column, bucketUs: Long): Column =
    floor(unix_micros(t) / bucketUs).cast("long")

  /** Join each probe row to every interval of the same key whose
    * [start, end) half-open window contains the probe's time. Intervals
    * longer than `bucketUs` are handled correctly — sequence() just
    * explodes them into proportionally more buckets (stress-tested to 30+
    * buckets per interval) — so the bucket width is purely a cost knob:
    * keep it ≥ the TYPICAL interval length so most intervals land in ≤ 2
    * buckets.
    *
    * Degenerate intervals are guarded, not passed to explode:
    *  - `end <= start` matches NOTHING under the half-open semantics (and
    *    sequence() would silently count DOWN for end < start), so such
    *    rows are filtered out — semantics-preserving, row-identical to
    *    the plain inequality join;
    *  - a span wider than `maxBucketsPerInterval` (one corrupt year-9999
    *    end date = millions of exploded rows per interval, and sequence()
    *    hard-fails past ~Int.MaxValue elements) FAILS LOUDLY instead of
    *    sinking the job — at corpus scale a silent multi-million-row
    *    explosion from one bad row is the worse failure mode. */
  def rangeJoin(probes: DataFrame, intervals: DataFrame, key: String,
                time: String, start: String, end: String,
                bucketUs: Long = DayUs,
                maxBucketsPerInterval: Int = 4096): DataFrame = {
    val p = probes.withColumn("__bucket", bucketOf(col(time), bucketUs))
    val b0 = bucketOf(col(start), bucketUs)
    val b1 = bucketOf(col(end), bucketUs)
    val ivl = intervals
      .filter(unix_micros(col(end)) > unix_micros(col(start)))
      .withColumn("__bucket", explode(
        when(b1 - b0 < maxBucketsPerInterval, sequence(b0, b1))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval [$start, $end) spans "), b1 - b0,
            lit(s" buckets (>= $maxBucketsPerInterval) — corrupt interval " +
              "end or too-narrow bucketUs"))))))
    p.join(ivl, Seq(key, "__bucket"))
      .filter(unix_micros(col(time)) >= unix_micros(col(start)) &&
              unix_micros(col(time)) < unix_micros(col(end)))
      .drop("__bucket")
  }

  /** The engine's range-join query: attribution — every click landing
    * inside a same-user 24-hour post-purchase window, as (click, purchase)
    * pairs. Inclusive start, exclusive end. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("window_end"))
    rangeJoin(clicks, windows, "user_id",
        time = "click_ts", start = "purchase_ts", end = "window_end")
      .select("user_id", "click_id", "click_ts", "purchase_ts")
  }
}
