package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's tree-ensemble path (04_1_XGB_traintest.R), Spark-first:
  * one-hot feature matrix → CV random/grid tuning → boosted/bagged trees →
  * metrics + gain-based feature importances.
  * (SURVEY.md §2.9: M2, M6, M8, M10, M11, M12, M13; §3.3.)
  *
  * XGBoost(dart, hist) has no exact MLlib analogue — per SURVEY §7.3 we
  * match capability (tuned tree ensembles on the same one-hot features) and
  * verify via metric thresholds, not tree identity. The repo's namesake
  * RandomForestRegressor ships alongside GBTRegressor.
  *
  * Scale notes: training data is a DETERMINISTIC key-derived sample
  * (`l_orderkey % k == 0`), not `.sample()` — row membership is independent
  * of partitioning, so results are stable across cluster layouts. MLlib
  * trees bin features (maxBins), the analogue of xgboost's
  * tree_method='hist' (04_1:289); split search is partition-distributed,
  * which is what replaces the reference's PSOCK process fan-out.
  */
object TreePipeline {

  /** Spark 4.1 quirk: `TreeConfig.trainingEarlyStopModelSizeThresholdInBytes`
    * is a mutable global that only Spark Connect's MLHandler initializes;
    * in classic mode it stays 0 and GradientBoostedTrees treats any
    * accumulated model size as "exceeds threshold (0 bytes)", silently
    * truncating training (measured: 16 of 20 requested trees, with only a
    * WARN). Disable the cap explicitly so maxIter/validationTol — the
    * documented stopping rules — decide when boosting stops. The field is
    * private[spark], hence reflection. */
  private val disableModelSizeCap: Unit = {
    try {
      val cls = Class.forName("org.apache.spark.ml.tree.TreeConfig$")
      val mod = cls.getField("MODULE$").get(null)
      cls.getMethod("trainingEarlyStopModelSizeThresholdInBytes_$eq",
          classOf[Long])
        .invoke(mod, java.lang.Long.valueOf(Long.MaxValue))
    } catch {
      case e: ReflectiveOperationException =>
        // never swallow silently: if Spark renames the field, the silent
        // 16-of-20-trees truncation this works around would return unseen
        System.err.println(
          "graft: could not disable GBT model-size cap (" + e +
            ") — boosting may truncate early with only a Spark WARN")
    }
  }

  /** M2: label + mixed numeric/categorical features; one-hot via
    * StringIndexer→OneHotEncoder→VectorAssembler (reference model.matrix,
    * 04_1:101-102). Sampling keys every `sampleMod`-th order keeps bench
    * cost flat as SF grows. */
  def dataset(spark: SparkSession, dir: String, sampleMod: Int): DataFrame =
    // `% sampleMod === 1` (not 0): residue 0 would intersect the forecast
    // universe (label NULL at l_orderkey % 10 == 0) and empty the sample
    OlsPipeline.dataset(spark, dir)
      .filter(col("label").isNotNull && col("l_orderkey") % sampleMod === 1)

  def featureStages(): Array[org.apache.spark.ml.PipelineStage] = {
    val idx = new StringIndexer().setInputCol("l_returnflag")
      .setOutputCol("flag_idx").setHandleInvalid("keep")
    val ohe = new OneHotEncoder().setInputCol("flag_idx")
      .setOutputCol("flag_vec").setDropLast(false)
    val asm = new VectorAssembler()
      .setInputCols((OlsPipeline.featureCols :+ "flag_vec").toArray)
      .setOutputCol("features")
    Array(idx, ohe, asm)
  }

  /** M2 as an ORACLE-GATED artifact (r8): the one-hot design matrix the
    * tree estimators consume, emitted per row straight from the assembled
    * `features` VECTOR (vector_to_array → element_at), not from the raw
    * columns — so the StringIndexer fit (frequencyDesc order, alphabetical
    * tie-break: documented, SQL-replayable), the OneHotEncoder layout
    * (dropLast=false) and the VectorAssembler slot order are all inside
    * the DuckDB hash. This shrinks the catalog's self-gated surface to the
    * tree ensembles themselves: the deterministic feature stage they
    * consume — and the county key their predictions aggregate on — is now
    * cross-engine-verified like any relational operator. */
  def featureMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ds = dataset(spark, dir, sampleMod = 15)
    val prep = new Pipeline().setStages(featureStages()).fit(ds)
    val out = prep.transform(ds)
    val names = featureNames(out)
    val numCols = OlsPipeline.featureCols
    val ohSlots = names.length - numCols.size
    // 3 return flags + the indexer's handleInvalid=keep __unknown bucket
    // (all-zero on seen data, but part of the layout the trees consume).
    // lineitem carries all three flags at every SF; a corpus that dropped
    // one would silently shrink the one-hot width — fail loudly instead
    // of hash-mismatching the static 4-slot oracle
    require(ohSlots == 4, s"expected 4 one-hot slots, got $ohSlots " +
      s"(vector slots: ${names.mkString(",")})")
    val arr = org.apache.spark.ml.functions.vector_to_array(col("features"))
    val cols = Seq(col("county"),
      col("flag_idx").cast(org.apache.spark.sql.types.LongType).as("flag_idx"),
      col("label")) ++
      numCols.zipWithIndex.map { case (f, i) =>
        element_at(arr, i + 1).as("x_" + f.stripPrefix("l_")) } ++
      (0 until ohSlots).map(i =>
        element_at(arr, numCols.size + i + 1).as(s"oh_$i"))
    out.select(cols: _*)
  }

  /** M11 (RandomForest) + M12: fit on the seeded 75/25 split, emit
    * gain-based feature importances top-k (04_1:330-331). */
  def rfImportance(spark: SparkSession, dir: String): DataFrame = {
    val ds = dataset(spark, dir, sampleMod = 9)
    // key-derived split: stable across partition layouts (see OlsPipeline)
    // cached: the indexer aggregate, the forest's input conversion and the
    // attribute-names probe each re-walk the scan+filter chain otherwise
    val (train0, _) = OlsPipeline.keySplit(ds, "l_orderkey", seed = 123)
    val train = train0.cache()
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol("label")
      .setNumTrees(20).setMaxDepth(6).setSeed(123)
    val pipe = new Pipeline().setStages(featureStages() :+ rf)
    val model = pipe.fit(train)
    val fitted = model.stages.last.asInstanceOf[
      org.apache.spark.ml.regression.RandomForestRegressionModel]
    val names = featureNames(model.transform(train.limit(1)))
    train.unpersist(blocking = false)
    val spark2 = spark
    import spark2.implicits._
    val imps = fitted.featureImportances.toArray
    // self-gating check (metric-threshold standard, SURVEY §5.4): gain
    // importances must be a valid distribution, and the constructed label
    // (3·quantity − 200·discount + 50·tax + noise) makes quantity the
    // dominant signal by range — a forest that doesn't find it is broken
    val top = imps.zipWithIndex.maxBy(_._1)
    val gateOk = imps.forall(v => v >= 0.0 && v <= 1.0) &&
      math.abs(imps.sum - 1.0) < 1e-6 &&
      names(top._2) == "l_quantity" && top._1 > 0.5
    imps.zipWithIndex
      .map { case (imp, i) => (names(i), imp) }
      .toSeq.toDF("feature", "importance")
      .orderBy(desc("importance"), asc("feature"))
      .limit(10)
      .select(col("feature"), round(col("importance"), 4).as("importance"),
        lit(gateOk).as("check"))
  }

  /** M10+M11 (GBT): boosted trees with early stopping via a validation
    * split (reference early_stopping_rounds=50, 04_1:287) + M13 metrics. */
  def gbtMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ds = dataset(spark, dir, sampleMod = 15)
    val (train, test) = OlsPipeline.keySplit(ds, "l_orderkey", seed = 123)
    val gbt = new GBTRegressor()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(20).setMaxDepth(4).setStepSize(0.2).setSeed(123)
      .setValidationIndicatorCol("is_val")
    // cached: the indexer fit, the boosting input conversion AND the
    // train-split metric pass below each re-walk the scan chain otherwise
    val trainVal = train.withColumn("is_val", col("l_orderkey") % 4 === 1)
      .cache()
    val pipe = new Pipeline().setStages(featureStages() :+ gbt)
    val model = pipe.fit(trainVal)
    // one scoring pass + one joint agg per split (not a job per metric);
    // R² as cor(a,p)² matches the reference's formula (05:49-59)
    def m(split: String, df: DataFrame): (String, Double, Double) = {
      val r = model.transform(df)
        .agg(
          sqrt(avg(pow(col("prediction") - col("label"), 2))).as("rmse"),
          pow(corr(col("label"), col("prediction")), 2).as("r2"))
        .collect()(0)
      (split, r.getDouble(0), r.getDouble(1))
    }
    val spark2 = spark
    import spark2.implicits._
    val out =
      Seq(m("train", trainVal), m("test", test.withColumn("is_val", lit(false))))
    trainVal.unpersist(blocking = false)
    out
      .toDF("split", "rmse", "r2")
      .select(col("split"), round(col("rmse"), 4).as("rmse"),
        round(col("r2"), 4).as("r2"))
      // self-gating band (the reference's own correctness standard for
      // models is metric thresholds, 05_OutcomeAndVisualization.R:49-90 /
      // SURVEY §5.4): the label's construction noise is U(-5,5) (sd≈2.9),
      // and the trained model sits at rmse≈3.6-4.0, r²≈0.992-0.993 at
      // sf0.01/sf0.1 — a NaN or degenerate fit fails the band (NaN fails
      // `between` on the upper bound), and the driver hashes the column,
      // so "rows-only" still asserts model QUALITY, not just rows>0
      .withColumn("check",
        col("rmse").between(0.001, 8.0) && col("r2").between(0.95, 1.0))
      .orderBy("split")
  }

  /** M8: k-fold CV over a param grid with parallelism — caret's PSOCK
    * random search (04_1:119-167) as CrossValidator. Runs on a 1%-scale
    * deterministic subsample like the reference's 10% tuning sample. */
  def cvBestParams(spark: SparkSession, dir: String): DataFrame = {
    val ds = dataset(spark, dir, sampleMod = 60)
    // the feature prep (indexer/encoder/assembler) is label-independent, so
    // fitting it ONCE outside the CV loop leaks nothing into the folds —
    // and the grid×fold fits (8 of them) then tune only the forest over a
    // cached vector frame instead of each re-running the indexer aggregate
    // + transform chain from the parquet scan
    val prep = new Pipeline().setStages(featureStages()).fit(ds)
    val vec = prep.transform(ds).select("features", "label").cache()
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol("label")
      .setNumTrees(10).setSeed(123)
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(3, 6))
      .addGrid(rf.subsamplingRate, Array(0.8, 1.0))
      .build()
    val cv = new CrossValidator()
      .setEstimator(rf)
      .setEvaluator(new RegressionEvaluator().setLabelCol("label")
        .setMetricName("rmse"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2).setParallelism(8).setSeed(123)
    val model = cv.fit(vec)
    vec.unpersist(blocking = false)
    val best = model.bestModel.asInstanceOf[
      org.apache.spark.ml.regression.RandomForestRegressionModel]
    val spark2 = spark
    import spark2.implicits._
    val bestRmse = BigDecimal(model.avgMetrics.min)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // self-gating check (SURVEY §5.4), tightened to the RECORDED winner:
    // the search is fully seeded (sample, folds, forest all derive from
    // seed 123), so the chosen params are a deterministic artifact, not a
    // band — (maxDepth=6, subsamplingRate=1.0) at every measured SF, with
    // CV rmse 9.7638 (sf0.01) / 8.6874 (sf0.1) on the 1/60 sample (full
    // history in docs/TUNING.md; the r6 gate was the loose declared-grid
    // membership + rmse<20). The rmse band brackets the recorded values
    // with margin for data-scale drift; a different winner, NaN, or a
    // degenerate fit all fail the hashed check column.
    val gateOk = best.getMaxDepth == 6 && best.getSubsamplingRate == 1.0 &&
      bestRmse > 7.5 && bestRmse < 11.0
    Seq((best.getMaxDepth, best.getSubsamplingRate, bestRmse, gateOk))
      .toDF("best_max_depth", "best_subsample_rate", "best_cv_rmse", "check")
  }

  /** Feature-slot names from the assembled vector's ML attribute metadata. */
  private def featureNames(df: DataFrame): Array[String] = {
    val group = AttributeGroup.fromStructField(df.schema("features"))
    group.attributes match {
      case Some(attrs) => attrs.map(a => a.name.getOrElse(s"f${a.index.get}"))
      case None => (0 until group.size).map(i => s"f$i").toArray
    }
  }
}
