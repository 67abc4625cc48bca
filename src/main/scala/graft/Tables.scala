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
  /** `events.ts` is parquet TIMESTAMP(NANOS) (pyarrow default), which the
    * Spark vectorized reader rejects. Read nanos as raw long via the legacy
    * conf, then convert to a proper (micros) timestamp — `div` keeps the
    * arithmetic in exact integer space (a double division would lose
    * precision above 2^53 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
