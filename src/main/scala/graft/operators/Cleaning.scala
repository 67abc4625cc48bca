package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Cleaning / projection operator surface (SURVEY.md §2.2: P2–P16).
  *
  * Re-expresses the reference's 02_DataCleaning.R stage over the driver
  * testdata. The testdata carries no physical NULLs, so the null-exercising
  * operators derive them deterministically in-query (`event_id % 7 == 0 →
  * NULL`) — the null branch is genuinely executed and oracle-checkable.
  *
  * Scale notes: every query here is scan → narrow map → (small) aggregate;
  * filters and column pruning reach the parquet scan via Catalyst, so the
  * same code holds on a partitioned 100 TB table with no extra shuffles.
  */
object Cleaning {

  /** Deterministic derived-null column: the testdata has no NULLs, so we
    * reproduce the reference's NA-bearing fact table (02_DataCleaning.R:35)
    * by nulling a fixed, key-derived subset. */
  private def withDerivedNulls(df: DataFrame): DataFrame =
    df.withColumn("value2",
        when(col("event_id") % 7 === 0, lit(null).cast(DoubleType))
          .otherwise(col("value")))
      .withColumn("user2",
        when(col("event_id") % 11 === 0, lit(null).cast(LongType))
          .otherwise(col("user_id")))

  /** P2: conditional update (reference 01_DataMerge.R:75 — ''→'NOPARTY'). */
  def condUpdate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("priority_norm",
        when(col("o_orderpriority") === "4-NOT SPECIFIED", lit("NONE"))
          .otherwise(col("o_orderpriority")))
      .groupBy("priority_norm")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("priority_norm")

  /** P3: ""→NULL normalization over all string columns (reference
    * 02_DataCleaning.R:35). `nullif` semantics; doc rows pass through
    * unchanged where non-empty. */
  def blankToNull(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val strCols = d.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSet
    d.select(d.columns.map { c =>
      if (strCols(c)) nullif(col(c), lit("")).as(c) else col(c)
    }.toSeq: _*)
      .agg(
        count(lit(1)).as("rows"),
        count(col("text")).as("text_nonnull"),
        count(col("lang")).as("lang_nonnull"),
        count(col("source")).as("source_nonnull"))
  }

  /** P5+P7+P9: column drop / select / rename in one projection (reference
    * 02_DataCleaning.R:51-70,129-133,235-237). c_acctbal is dropped, so
    * column pruning must keep it out of the parquet ReadSchema. */
  def selectRenameDrop(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .drop("c_acctbal")
      .withColumnRenamed("c_mktsegment", "segment")
      .select(col("c_custkey").as("id"), col("c_name"), col("segment"))

  /** P8: schema-map type casts (reference 02_DataCleaning.R:74-125):
    * numeric→int, timestamp→date, string normalization — the declared
    * StructType discipline. */
  def schemaCast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        // decimal money cast, emitted as exact BIGINT cents: the driver hash
        // distinguishes Spark/DuckDB decimal physical encodings on multi-row
        // outputs; int64 is representation-stable across engines
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("price_cents"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        lower(col("l_returnflag")).as("flag_lc"))

  /** P10: date-predicate filter (reference 02_DataCleaning.R:139). */
  def dateFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast(DateType))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        min(col("o_orderdate").cast(DateType)).as("min_date"),
        max(col("o_orderdate").cast(DateType)).as("max_date"))
      .orderBy("o_orderpriority")

  /** P11: null-keeping outlier filter — `x < k | is.na(x)` (reference
    * 02_DataCleaning.R:207-214). The explicit `.isNull` branch is the SQL
    * three-valued-logic trap: a plain `x < k` silently drops NULL rows. */
  def outlierKeepNull(spark: SparkSession, dir: String): DataFrame =
    withDerivedNulls(Tables.events(spark, dir))
      .filter(col("value2") < 100 || col("value2").isNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), count(col("value2")).as("nonnull_cnt"))
      .orderBy("event_type")

  /** P12: isNotNull filter (reference 01_DataMerge.R:139). */
  def notNullFilter(spark: SparkSession, dir: String): DataFrame =
    withDerivedNulls(Tables.events(spark, dir))
      .filter(col("value2").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** P13: na.drop — drop rows with ANY null column (reference
    * 04_1_XGB_traintest.R:72). */
  def naDrop(spark: SparkSession, dir: String): DataFrame =
    withDerivedNulls(Tables.events(spark, dir))
      .na.drop()
      .agg(count(lit(1)).as("rows_kept"))

  /** P14: null-partition split — observed vs forecast universes (reference
    * 03_LinearRegression.R:37-38). Both partitions in one grouped pass. */
  def nullSplit(spark: SparkSession, dir: String): DataFrame =
    withDerivedNulls(Tables.events(spark, dir))
      .groupBy(col("value2").isNull.as("is_forecast"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("is_forecast")

  /** P15: limit slice, made deterministic by key order (reference
    * 04_2_XGB_forecast.R:53). */
  def limitSlice(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .orderBy("c_custkey")
      .limit(100)
      .select("c_custkey", "c_name", "c_mktsegment")

  /** P16 (+W2): row-index attach. Spark has no stable row order, so the
    * reference's positional index (04_2_XGB_forecast.R:425-432) becomes an
    * explicit `row_number` over a declared key order — key-carrying, not
    * positional. */
  def rowIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.customer(spark, dir)
      .orderBy("c_custkey")
      .limit(200)
      .select(
        row_number().over(Window.orderBy("c_custkey")).cast(LongType).as("idx"),
        col("c_custkey"),
        col("c_mktsegment"))
  }
}
