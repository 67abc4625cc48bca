package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join elides both shuffle exchanges") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "k")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "k")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    // in-memory catalog forgets tables across JVMs but their files persist —
    // clear the physical locations too
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    Seq("bkt_orders", "bkt_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    Bucketing.writeBucketed(o, "bkt_orders", "k", 8)
    Bucketing.writeBucketed(l, "bkt_lineitem", "k", 8)
    // force the sort-merge path: at test scale the planner would broadcast
    // (whose BroadcastExchange is not a shuffle), hiding what we assert —
    // that bucket alignment removes the ShuffleExchanges a 100 TB
    // fact-fact join would otherwise pay
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      val expected = o.join(l, "k").count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
