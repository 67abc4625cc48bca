package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Rare-category→"Other" coalescing (SURVEY.md §2.8 F12; reference
  * `addFactorOther` + remap, 02_DataCleaning.R:243-261).
  *
  * Fit/transform split so train/forecast symmetry holds (the reference
  * learns levels on the train universe and applies them to forecasts).
  *
  * Scale design: we collect the FREQUENT set, not the rare one — by
  * pigeonhole at most ⌈1/threshold⌉ categories can have share ≥ threshold,
  * so the driver-side model is bounded (≤25 entries at t=0.04) no matter
  * how many distinct rare categories a 100 TB table holds. The transform is
  * a broadcast `isin` over that bounded set — no shuffle, stays inside
  * whole-stage codegen.
  */
final case class RareCategoryModel(column: String, frequent: Seq[String]) {
  def transform(df: DataFrame): DataFrame =
    df.withColumn(column,
      when(col(column).isin(frequent: _*), col(column))
        .otherwise(lit("Other")))
}

object RareCategory {
  /** ONE pass over the fact: category counts; the total then derives from
    * the (much smaller) grouped result instead of a second fact scan, and
    * only the bounded frequent set is collected. */
  def fit(df: DataFrame, column: String, threshold: Double): RareCategoryModel = {
    val counts = df.groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .cache() // grouped frame (≪ fact); reused by the total + filter jobs
    try {
      val total = counts.agg(sum(col("cnt"))).collect()(0).getLong(0).toDouble
      val frequent = counts.filter(col("cnt") / total >= threshold)
        .collect()
        .map(_.getString(0))
        .toSeq
      RareCategoryModel(column, frequent)
    } finally counts.unpersist()
  }

  /** Oracle-checked query: coalesce rare `documents.source` values, then
    * profile the result. Threshold 0.045 puts a nontrivial subset of the
    * ~20 sources below the gate at every SF. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val model = fit(d, "source", 0.045)
    model.transform(d)
      .groupBy(col("source").as("source2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("source2")
  }
}
