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

  // -- exact (oracle-checkable) diagnostics query -------------------------


  /** Registered query, bit-deterministic and hash-oracle-checked: BP, VIF
    * and HC0 all reduce to TWO distributed aggregation passes of exact
    * BIGINT-micros sums (`esum`) — the (1,x,y) gram and the e²-weighted
    * moments —
    * followed by driver-side closed-form algebra (Cramer solves, adjugate
    * inverse rows, quadratic forms) whose every formula is mirrored
    * verbatim, in the same evaluation order, by the generated DuckDB SQL
    * (SparkEntry "q_ols_diagnostics"):
    *  - BP LM = n·R² of e² on the features, both from moments;
    *  - VIF_j from 3×3 Cramer solves over the same gram cells;
    *  - HC0 SEs from rows 0,1 of (X'X)⁻¹ (adjugate/det) and the
    *    e²-weighted meat matrix, as explicit quadratic forms.
    * Threshold semantics are asserted separately in DiagnosticsSpec via
    * the general (double-sum) implementations above. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val features = OlsPipeline.featureCols
    // The closed-form path below is structurally pinned to k=3 features
    // (4×4 gram, Cramer-4 solves, 3×3 cofactors, the beta(1..3) residual).
    // Fail at the entry point if the Seq ever changes, instead of
    // reporting silently wrong diagnostics. The general-k path is the
    // double-sum API above (fitOls/breuschPagan/vif/hc0).
    require(features.length == 3,
      s"diagnostics query is specialized to 3 features, got $features")
    val ds = OlsPipeline.dataset(spark, dir).filter(col("label").isNotNull)
      .select((features :+ "label").map(col): _*)
      .cache()
    val s = OlsPipeline.gram(ds) // pass 1: (1,x1..x3,label) gram
    val beta = OlsPipeline.solveBeta(s)
    val n = s(0, 0)

    // pass 2: e²-weighted moments m(i,j)=Σe²·xi·xj (x0=1) and Σ(e²)²
    val xs: Seq[Column] = lit(1.0) +: features.map(col)
    val e = col("label") - (lit(beta(0)) + col(features(0)) * beta(1) +
      col(features(1)) * beta(2) + col(features(2)) * beta(3))
    val e2 = e * e
    val aggs =
      (for (i <- 0 to 3; j <- i to 3)
        yield OlsPipeline.esum(if (i == 0 && j == 0) e2
                   else if (i == 0) e2 * xs(j)
                   else e2 * xs(i) * xs(j)).as(s"m_${i}_$j")) :+
        OlsPipeline.esum(e2 * e2).as("se4")
    val row = ds.agg(aggs.head, aggs.tail: _*).collect()(0)
    ds.unpersist(blocking = false)
    def m(i: Int, j: Int): Double = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      row.getDouble(row.fieldIndex(s"m_${a}_$b"))
    }
    val se4 = row.getDouble(row.fieldIndex("se4"))

    // BP: regress z=e² on features (X'X = gram cells, X'z = m(0,·))
    val gamma = OlsPipeline.solveCramer4((i, j) => s(i, j), i => m(0, i))
    val sseAux = se4 -
      (gamma(0) * m(0, 0) + gamma(1) * m(0, 1) + gamma(2) * m(0, 2) +
        gamma(3) * m(0, 3))
    val zbar = m(0, 0) / n
    val sstAux = se4 - n * zbar * zbar
    val lm = n * (1.0 - sseAux / sstAux)

    // VIF_j: regress xj on (1, other two) — 3×3 Cramer over gram cells
    val maxVif = (1 to 3).map { j =>
      val o = (0 to 3).filterNot(_ == j) // (0, a, b)
      val d3 = OlsPipeline.det3((r, c) => s(o(r), o(c)))
      val delta = Array.tabulate(3) { k =>
        OlsPipeline.det3((r, c) =>
          if (c == k) s(o(r), j) else s(o(r), o(c))) / d3
      }
      val sse = s(j, j) -
        (delta(0) * s(o(0), j) + delta(1) * s(o(1), j) +
          delta(2) * s(o(2), j))
      val xbar = s(0, j) / n
      val sst = s(j, j) - n * xbar * xbar
      1.0 / (1.0 - (1.0 - sse / sst))
    }.max

    // HC0: v = (X'X)⁻¹ M (X'X)⁻¹; only rows 0 and 1 of the inverse are
    // needed for the two reported SEs. inv[i][j] = (-1)^(i+j)·det3(minor
    // without row j, col i)/det — X'X symmetric, same adjugate order as
    // the SQL.
    val dA = OlsPipeline.det4((i, j) => s(i, j))
    def invCell(i: Int, j: Int): Double = {
      val rows = (0 to 3).filterNot(_ == j)
      val cols = (0 to 3).filterNot(_ == i)
      val minor = OlsPipeline.det3((r, c) => s(rows(r), cols(c)))
      (if ((i + j) % 2 == 0) minor else -minor) / dA
    }
    def quad(br: Array[Double]): Double = {
      var acc = 0.0
      var first = true
      for (k <- 0 to 3; l <- 0 to 3) {
        val t = br(k) * m(k, l) * br(l)
        if (first) { acc = t; first = false } else acc += t
      }
      acc
    }
    val inv0 = Array.tabulate(4)(j => invCell(0, j))
    val inv1 = Array.tabulate(4)(j => invCell(1, j))
    val se0 = math.sqrt(quad(inv0))
    val se1 = math.sqrt(quad(inv1))

    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark2 = spark
    import spark2.implicits._
    Seq((r4(lm), features.length, r4(maxVif), r4(se0), r4(se1)))
      .toDF("bp_lm", "bp_df", "max_vif", "hc0_se_intercept", "hc0_se_qty")
  }
}
