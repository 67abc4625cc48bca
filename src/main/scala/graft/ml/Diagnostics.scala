package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLS inference diagnostics (SURVEY.md §2.9 M5; reference
  * 03_LinearRegression.R:82-116): Breusch–Pagan heteroscedasticity test,
  * HC0 (White) robust standard errors, and VIF — none of which MLlib
  * provides.
  *
  * Design for scale: every statistic reduces to CROSS-MOMENT SUMS
  * (Σ xᵢxⱼ, Σ xᵢy, Σ e²xᵢxⱼ), gathered in ONE distributed aggregation pass
  * per moment matrix — a k(k+1)/2-cell partial-aggregated reduce, k ≤ tens.
  * The k×k solves/inversions then run driver-side (Gaussian elimination
  * with partial pivoting, ~30 LoC) on bounded data, which is exactly how
  * the reference's gpuLm normal-equation path works (03:78) minus the GPU.
  */
object Diagnostics {

  // -- driver-side small linear algebra ---------------------------------

  /** Solve A·x = b in place (partial pivoting). A is n×n, small. */
  def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    for (p <- 0 until n) {
      var max = p
      for (i <- p + 1 until n) if (math.abs(a(i)(p)) > math.abs(a(max)(p))) max = i
      val t = a(p); a(p) = a(max); a(max) = t
      val tb = b(p); b(p) = b(max); b(max) = tb
      require(math.abs(a(p)(p)) > 1e-12, "singular moment matrix")
      for (i <- p + 1 until n) {
        val f = a(i)(p) / a(p)(p)
        b(i) -= f * b(p)
        for (j <- p until n) a(i)(j) -= f * a(p)(j)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  def invert(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val cols = (0 until n).map { j =>
      val e = Array.fill(n)(0.0); e(j) = 1.0
      solve(a, e)
    }
    Array.tabulate(n, n)((i, j) => cols(j)(i))
  }

  def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.length, b(0).length)((i, j) =>
      a(i).indices.map(k => a(i)(k) * b(k)(j)).sum)

  // -- distributed moment gathering -------------------------------------

  /** One aggregation pass: all pairwise sums Σ wᵢ·cᵢ·cⱼ for the given
    * columns (with intercept), optionally weighted. */
  def crossMoments(df: DataFrame, cols: Seq[Column],
                   weight: Option[Column] = None): Array[Array[Double]] = {
    val k = cols.length
    val w = weight.getOrElse(lit(1.0))
    val aggs = for (i <- 0 until k; j <- i until k)
      yield sum(w * cols(i) * cols(j)).as(s"m_${i}_$j")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val m = Array.ofDim[Double](k, k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      m(i)(j) = row.getDouble(idx); m(j)(i) = m(i)(j); idx += 1
    }
    m
  }

  /** OLS via normal equations on distributed moments: returns coefficients
    * for (intercept +: features). */
  def fitOls(df: DataFrame, features: Seq[String], label: String): Array[Double] = {
    val xs = lit(1.0) +: features.map(col)
    val all = crossMoments(df, xs :+ col(label))
    val k = xs.length
    val xtx = Array.tabulate(k, k)((i, j) => all(i)(j))
    val xty = Array.tabulate(k)(i => all(i)(k))
    solve(xtx, xty)
  }

  private def residualCol(features: Seq[String], label: String,
                          beta: Array[Double]): Column =
    features.zipWithIndex.foldLeft(col(label) - lit(beta(0))) {
      case (acc, (f, i)) => acc - lit(beta(i + 1)) * col(f)
    }

  /** R² of `label` on `features` (via one moment pass + one residual agg). */
  def r2(df: DataFrame, features: Seq[String], label: String): Double = {
    val beta = fitOls(df, features, label)
    val row = df.agg(
      sum(pow(residualCol(features, label, beta), 2)).as("sse"),
      sum(pow(col(label), 2)).as("syy"),
      avg(col(label)).as("my"),
      count(lit(1)).as("n")).collect()(0)
    val sst = row.getDouble(1) - row.getLong(3) * row.getDouble(2) * row.getDouble(2)
    1.0 - row.getDouble(0) / sst
  }

  /** Breusch–Pagan: regress squared residuals on the features; LM = n·R².
    * Under H0 (homoscedastic) LM ~ χ²(k). */
  def breuschPagan(df: DataFrame, features: Seq[String], label: String): (Double, Int) = {
    val beta = fitOls(df, features, label)
    val e2 = df.withColumn("__e2",
      pow(residualCol(features, label, beta), 2))
    val lm = e2.count() * r2(e2, features, "__e2")
    (lm, features.length)
  }

  /** VIF per feature: 1/(1−R²ⱼ) of feature j on the others. */
  def vif(df: DataFrame, features: Seq[String]): Map[String, Double] =
    features.map { f =>
      f -> 1.0 / (1.0 - r2(df, features.filterNot(_ == f), f))
    }.toMap

  /** HC0 (White) robust covariance: (X'X)⁻¹ (Σ e²ᵢ xᵢxᵢ') (X'X)⁻¹;
    * returns robust SEs for (intercept +: features). */
  def hc0(df: DataFrame, features: Seq[String], label: String): Array[Double] = {
    val beta = fitOls(df, features, label)
    val xs = lit(1.0) +: features.map(col)
    val withE2 = df.withColumn("__e2",
      pow(residualCol(features, label, beta), 2))
    val xtx = crossMoments(withE2, xs)
    val meat = crossMoments(withE2, xs, Some(col("__e2")))
    val bread = invert(xtx)
    val v = matMul(matMul(bread, meat), bread)
    Array.tabulate(xs.length)(i => math.sqrt(v(i)(i)))
  }

  /** Registered query: one diagnostics row over the OLS fixture (rows-only
    * driver check; thresholds asserted in DiagnosticsSpec). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val features = OlsPipeline.featureCols
    // BP + VIF + HC0 together make ~13 aggregation passes; cache the
    // (features, label) projection once so they reduce over memory, not
    // over repeated parquet scans of the full-width table.
    val ds = OlsPipeline.dataset(spark, dir).filter(col("label").isNotNull)
      .select((features :+ "label").map(col): _*)
      .cache()
    val (lm, dfree) = breuschPagan(ds, features, "label")
    val vifs = vif(ds, features)
    val ses = hc0(ds, features, "label")
    ds.unpersist(blocking = false)
    val spark2 = spark
    import spark2.implicits._
    Seq((
      math.round(lm * 10000).toDouble / 10000, dfree,
      math.round(vifs.values.max * 10000).toDouble / 10000,
      math.round(ses(0) * 10000).toDouble / 10000,
      math.round(ses(1) * 10000).toDouble / 10000))
      .toDF("bp_lm", "bp_df", "max_vif", "hc0_se_intercept", "hc0_se_qty")
  }
}
