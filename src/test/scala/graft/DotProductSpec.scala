package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite {
  import TestSpark._

  test("vec_dot matches the HOF composition on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val diff = e
      .withColumn("native", call_function("vec_dot", col("embedding"), col("embedding")))
      .withColumn("hof", expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> " +
          "CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .agg(max(abs(col("native") - col("hof")))).collect()(0).getDouble(0)
    assert(diff < 1e-9)
  }

  test("vec_dot handles mixed float/double arrays and nulls") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(3.0D, 4.0D)) AS d").collect()(0).getDouble(0)
    assert(math.abs(out - 11.0) < 1e-12)
    val nul = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d")
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("vec_dot stays inside whole-stage codegen (no CodegenFallback)") {
    val e = Tables.embeddings(spark, sf)
    val plan = e.withColumn("d",
      call_function("vec_dot", col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages; the projection with
    // vec_dot must sit inside one (a CodegenFallback would eject it)
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(plan.contains("vec_dot"), plan.take(500))
  }
}
