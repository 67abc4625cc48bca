package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-score scaling with fit / transform / inverse (SURVEY.md §2.9 M1;
  * reference `scale()` + kept centers/scales for the inverse transform,
  * 03_LinearRegression.R:29-34,127-129).
  *
  * Fit is ONE aggregation pass over all columns (single reduce at any
  * scale); the model is a bounded driver-side map (2 doubles per column)
  * applied as a narrow projection — no shuffle, codegen-friendly.
  */
final case class ZScalerModel(stats: Map[String, (Double, Double)]) {

  /** Replace each fitted column with its z-score. */
  def transform(df: DataFrame): DataFrame =
    stats.foldLeft(df) { case (d, (c, (mu, sigma))) =>
      d.withColumn(c, (col(c) - lit(mu)) / lit(sigma))
    }

  /** Map a column back to the original space of `fittedCol` —
    * the reference unscales *predictions* with the label's (μ,σ). */
  def inverse(df: DataFrame, column: String, fittedCol: String): DataFrame = {
    val (mu, sigma) = stats(fittedCol)
    df.withColumn(column, col(column) * lit(sigma) + lit(mu))
  }
}

object ZScaler {
  def fit(df: DataFrame, cols: Seq[String]): ZScalerModel = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}__mu"), stddev_samp(col(c)).as(s"${c}__sd")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    ZScalerModel(cols.map { c =>
      c -> (row.getAs[Double](s"${c}__mu"), row.getAs[Double](s"${c}__sd"))
    }.toMap)
  }
}
