package graft

import graft.ml.{Diagnostics, OlsPipeline}
import graft.operators.GeoJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiagnosticsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val observed =
    OlsPipeline.dataset(spark, sf).filter(col("label").isNotNull)

  test("normal-equation OLS recovers the planted coefficients") {
    val beta = Diagnostics.fitOls(observed, OlsPipeline.featureCols, "label")
    // label = 3·qty − 200·disc + 50·tax + sin-noise; intercept ≈ 0
    assert(math.abs(beta(0)) < 1.0, s"intercept=${beta(0)}")
    assert(math.abs(beta(1) - 3.0) < 0.05, s"qty=${beta(1)}")
    assert(math.abs(beta(2) + 200.0) < 15.0, s"disc=${beta(2)}")
    assert(math.abs(beta(3) - 50.0) < 15.0, s"tax=${beta(3)}")
  }

  test("Breusch-Pagan accepts homoscedastic noise, flags heteroscedastic") {
    val (lm, k) = Diagnostics.breuschPagan(observed, OlsPipeline.featureCols, "label")
    // sin-noise is independent of features → LM ~ χ²(3); 16.3 = χ²₃ at 0.001
    assert(k === 3)
    assert(lm < 16.3, s"BP LM=$lm on homoscedastic data")
    // planted heteroscedasticity: noise scaled by a feature → must reject
    val het = observed.withColumn("label",
      col("label") + col("l_quantity") * sin(col("l_orderkey") * 1.3) * 2)
    val (lmHet, _) = Diagnostics.breuschPagan(het, OlsPipeline.featureCols, "label")
    assert(lmHet > 16.3, s"BP LM=$lmHet on heteroscedastic data")
  }

  test("VIF ≈ 1 for independent features, large for a collinear one") {
    val v = Diagnostics.vif(observed, OlsPipeline.featureCols)
    assert(v.values.forall(x => x > 0.9 && x < 1.5), s"vif=$v")
    val collinear = observed.withColumn("qty2",
      col("l_quantity") * 2 + col("l_tax"))
    val v2 = Diagnostics.vif(collinear, OlsPipeline.featureCols :+ "qty2")
    assert(v2("qty2") > 10, s"vif collinear=${v2("qty2")}")
  }

  test("HC0 robust SEs agree with classical scale under homoscedasticity") {
    val ses = Diagnostics.hc0(observed, OlsPipeline.featureCols, "label")
    assert(ses.forall(s => s > 0 && s.isFinite))
    // homoscedastic → HC0 within 2× of the classical OLS SE for qty
    val n = observed.count().toDouble
    assert(ses(1) < 0.1, s"se(qty)=${ses(1)} at n=$n")
  }

  test("J5 polygon UDF: ray casting against broadcast polygons") {
    import spark.implicits._
    val square = GeoJoin.Polygon(7L,
      Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)))
    val tri = GeoJoin.Polygon(8L, Seq((20.0, 0.0), (30.0, 0.0), (25.0, 10.0)))
    val f = GeoJoin.pointInCounty(spark, Seq(square, tri))
    val pts = Seq((5.0, 5.0), (25.0, 2.0), (15.0, 15.0), (-1.0, 5.0))
      .toDF("lat", "lon")
    val out = pts.withColumn("cid", f(col("lat"), col("lon")))
      .collect().map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    assert(out(0) === Some(7L)) // inside square
    assert(out(1) === Some(8L)) // inside triangle
    assert(out(2) === None)     // outside both
    assert(out(3) === None)     // outside (ocean → NULL, latlong2 NA)
  }

  test("J5 grid join covers every point exactly once") {
    val total = SparkEntry.queries("q_geo_join")(spark, sf)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === Tables.customer(spark, sf).count())
  }
}
