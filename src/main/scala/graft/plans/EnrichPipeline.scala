package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.{GeoJoin, RareCategory}

/** The reference's full ingest→enrich→clean chain (entry point A, SURVEY
  * §3.1: 01_DataMerge.R + 02_DataCleaning.R) as ONE lazy DataFrame lineage.
  *
  * The reference materializes to disk after every statement (eager ffdf);
  * here the whole chain is a single Catalyst plan — pushdown, pruning and
  * join planning optimize ACROSS stage boundaries, with an explicit
  * checkpoint only where the reference persists (01:143).
  *
  * Stage map (reference → here):
  *  - vote pivot→ratio per county (01:69-89)  → priority pivot→ratio per
  *    nation (reuses Relational.pivotRatio's shape)
  *  - geo join lat/lon→county (01:119-128)    → GeoJoin grid, broadcast
  *  - left enrichment joins (01:131-132)      → LEFT join ratio by nation
  *  - filter matched (01:139)                 → ratio.isNotNull
  *  - casts (02:74-125)                       → decimal money cast
  *  - date filter (02:139)                    → o_orderdate ≥ 1996-01-01
  *  - null-keeping outlier filter (02:207-214)→ price < 400k ∨ NULL
  *  - rare-category→Other (02:243-261)        → o_orderstatus, t=0.05
  *  - final select + profile (02:235-237)     → bounded grouped output
  *
  * Composed via `Stage` values so each step is testable alone AND fuses
  * into one plan when chained (the `pipe` fold builds a single lineage).
  */
object EnrichPipeline {

  final case class Stage(name: String, apply: DataFrame => DataFrame)

  def pipe(df: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(df)((d, s) => s.apply(d))

  /** Per-nation priority ratio dimension (the "county vote ratio" table). */
  def ratioDim(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.pivotRatio(spark, dir)
      .select(col("n_name"), col("ratio"))

  def stages(spark: SparkSession, dir: String): Seq[Stage] = Seq(
    Stage("geo_enrich", { df =>
      // synthetic point per order's customer → grid cell → region id
      // (GeoJoin.pointCols is the one Scala copy of the point formula)
      val (latC, lonC) = GeoJoin.pointCols(col("o_custkey"))
      val withCells = df
        .withColumn("lat", latC)
        .withColumn("lon", lonC)
        .withColumn("lat_cell", floor(col("lat")).cast(LongType))
        .withColumn("lon_cell", floor(col("lon") / 10).cast(LongType))
      withCells.join(broadcast(GeoJoin.grid(spark)),
        Seq("lat_cell", "lon_cell"), "left")
        .drop("lat", "lon", "lat_cell", "lon_cell")
    }),
    Stage("ratio_enrich", { df =>
      val c = Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")
      val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      // customer is fact-proportional: shuffled join; nation + ratio dim
      // are bounded: broadcast LEFT joins (01_DataMerge.R:131-132)
      df.join(c, df("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(ratioDim(spark, dir)), Seq("n_name"), "left")
        .drop("c_custkey", "c_nationkey", "n_nationkey")
    }),
    Stage("filter_matched",
      _.filter(col("ratio").isNotNull)),
    Stage("cast_money",
      _.withColumn("o_totalprice",
        col("o_totalprice").cast(DecimalType(18, 2)))),
    Stage("date_filter",
      _.filter(col("o_orderdate") >= lit("1996-01-01").cast(DateType))),
    Stage("outlier_keep_null",
      _.filter(col("o_totalprice") < 400000 || col("o_totalprice").isNull)),
    Stage("rare_status_other", { df =>
      // o_orderstatus is uniform (~33% each) — derive rare variants
      // (o_orderkey % 50 → ~0.7% share) so the estimator's Other branch
      // is genuinely exercised, like the reference's long-tail factors
      RareCategoryModelCache.get(spark, dir)
        .transform(df.withColumn("status_cat", statusCat))
    }),
    Stage("final_select",
      _.select("o_orderkey", "region_id", "n_name", "status_cat",
        "o_totalprice", "ratio")))

  /** Derived category with a deterministic rare tail. */
  private def statusCat: org.apache.spark.sql.Column =
    concat(col("o_orderstatus"),
      when(col("o_orderkey") % 50 === 0, lit("_rare")).otherwise(lit("")))

  /** Fit-once cache for the rare-category model (fit on the raw fact,
    * applied inside the lineage — train/apply symmetry like F12). Keyed on
    * (session, dir): the model holds a session-bound frequency map, and a
    * stale hit after a session restart would reference a stopped session. */
  private object RareCategoryModelCache {
    @volatile private var cached: Option[((SparkSession, String), graft.operators.RareCategoryModel)] = None
    def get(spark: SparkSession, dir: String): graft.operators.RareCategoryModel =
      cached match {
        case Some((k, m)) if k == (spark, dir) => m
        case _ =>
          val m = RareCategory.fit(
            Tables.orders(spark, dir).withColumn("status_cat", statusCat),
            "status_cat", 0.05)
          cached = Some(((spark, dir), m))
          m
      }
  }

  /** End-to-end query: full chain → bounded profile (the t2 contract). */
  def query(spark: SparkSession, dir: String): DataFrame =
    pipe(Tables.orders(spark, dir), stages(spark, dir))
      .groupBy("region_id", "status_cat")
      .agg(
        count(lit(1)).as("cnt"),
        // exact decimal sum emitted as BIGINT cents (the driver hash covers
        // the physical decimal encoding, which differs between engines)
        (sum(col("o_totalprice")) * 100).cast(LongType).as("sum_price_cents"),
        // max, not avg: a double average's last-ulp summation order would
        // leak into the rounded hash (ratio itself is already rounded)
        max(col("ratio")).as("max_ratio"))
      .orderBy("region_id", "status_cat")
}
