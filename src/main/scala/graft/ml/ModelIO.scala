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
}
