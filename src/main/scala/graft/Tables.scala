package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated testdata (TESTDATA.md).
  *
  * Mirrors the reference's data layer — out-of-core, column-chunked tables
  * (`read.csv.ffdf`, reference 01_DataMerge.R:42-47; `save.ffdf`/`load.ffdf`
  * checkpoints, 01_DataMerge.R:50,143) — as partitioned Parquet scans.
  * Column pruning and predicate pushdown reach the scan via Catalyst, which
  * is what makes the same code hold at 100 TB: only referenced columns and
  * row groups are read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy parquet scan; Catalyst prunes columns/pushes filters into it. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Normalize `events.ts` to a session-zone timestamp whatever the
    * generator's parquet physical type is. Older testdata wrote
    * TIMESTAMP(NANOS) — the Spark vectorized reader rejects it, so with
    * `nanosAsLong` it arrives as a raw epoch-nanos LONG and `div` keeps the
    * micros conversion in exact integer space (a double division would lose
    * precision above 2^53 ns). Current testdata writes timestamp[us] with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ; the session
    * timezone is pinned to UTC, so the NTZ→TZ cast is value-preserving and
    * both generations yield identical instants. */
  def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Session defaults shared by tests/tools (Verify/Bench build their own
    * per the driver contract). Shuffle partitions = `cores` (default 4 for
    * tests; pass 32 to match local[32]); AQE coalesces/re-plans at runtime —
    * the knob that scales this config to a real cluster is ONLY the
    * partition count.
    */
  def localSession(appName: String, cores: Int = 4): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
