package graft

import graft.plans.EnrichPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnrichPipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("chain fuses to one plan with pushed filters (no per-stage barriers)") {
    val full = EnrichPipeline.pipe(
      Tables.orders(spark, sf), EnrichPipeline.stages(spark, sf))
    val plan = full.queryExecution.executedPlan.toString
    // the date filter written in stage 5 must reach the orders scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderdate"), plan.take(800))
  }

  test("stages are individually applicable and order-sensitive where documented") {
    val base = Tables.orders(spark, sf)
    val ss = EnrichPipeline.stages(spark, sf)
    val afterGeo = ss.head.apply(base)
    assert(afterGeo.columns.contains("region_id"))
    // every order maps to a region (grid covers the synthetic point space)
    assert(afterGeo.filter(col("region_id").isNull).count() === 0)
  }

  test("end-to-end profile is non-empty and rare status coalesced") {
    val out = SparkEntry.queries("q_enrich_pipeline")(spark, sf).collect()
    assert(out.nonEmpty)
    val statuses = out.map(_.getString(1)).toSet
    // the derived '*_rare' variants (~0.7% share) must fold into Other
    assert(!statuses.exists(_.endsWith("_rare")), s"statuses=$statuses")
    assert(statuses.contains("Other"))
    assert(statuses.intersect(Set("O", "F", "P")).nonEmpty)
  }
}
