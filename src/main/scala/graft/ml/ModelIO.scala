package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.DataFrame

/** Model binary sink/source (SURVEY.md §2.1 S5: xgb.save / load analogue,
  * 04_1_XGB_traintest.R:402,409-410). MLlib's native persistence — params +
  * tree/coefficient data as parquet under the path — replaces the
  * reference's ad-hoc RDS/binary files. */
object ModelIO {
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PipelineModel =
    PipelineModel.load(path)

  def fitAndCheckpoint(pipe: Pipeline, train: DataFrame, path: String): PipelineModel = {
    val m = pipe.fit(train)
    save(m, path)
    m
  }

  /** Oracle-checked S5 lifecycle: fit → save → load → score with BOTH the
    * original and the reloaded model → count prediction mismatches. The
    * expected output is (universe row count, 0 mismatches) — a pure count
    * the DuckDB oracle states independently — so save/load fidelity is
    * verified through the driver gate, not just a unit test. */
  def modelRoundTrip(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ds = graft.ml.TreePipeline.dataset(spark, dir, sampleMod = 45).cache()
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("label").setSolver("normal")
    val pipe = new Pipeline()
      .setStages(graft.ml.TreePipeline.featureStages() :+ lr)
    val path = graft.sources.CsvIO.scratch("model_rt_q", dir)
    val m = fitAndCheckpoint(pipe, ds, path)
    val back = load(spark, path)
    // featurize ONCE with the fitted prep stages, then score side by side
    // with the original and the reloaded regressor (no key join — lineitem
    // keys are non-unique)
    val feat = m.stages.init.foldLeft(ds.toDF())((d, s) => s.transform(d))
    val m1 = m.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val m2 = back.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
      .setPredictionCol("p2")
    val out = m2.transform(m1.transform(feat))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(col("prediction") =!= col("p2"), 1L).otherwise(0L))
          .as("mismatches"))
    ds.unpersist(blocking = false)
    out
  }
}
