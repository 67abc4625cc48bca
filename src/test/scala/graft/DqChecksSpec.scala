package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality expectation-suite contracts (DqChecks.scala). */
class DqChecksSpec extends AnyFunSuite {
  import TestSpark._

  test("dq checks: full suite present, pass flag consistent, planted FK hole counted") {
    val rows = SparkEntry.queries("q_dq_checks")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === Set(
      "lineitem.discount_in_0_1", "lineitem.quantity_positive",
      "lineitem.price_not_null", "orders.orderkey_unique",
      "events.value_not_null", "orders.custkey_fk", "lineitem.orderkey_fk"))
    rows.foreach { case (n, v, t, p) =>
      assert(v >= 0 && v <= t, s"$n violations out of range")
      assert(p === (if (v == 0) 1L else 0L), s"$n pass flag inconsistent")
    }
    // the planted dim hole must surface as REAL failures, independently
    // recounted: orders referencing a removed (custkey % 97 == 0) customer
    val expected = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 97 === 0).count()
    val fk = rows.find(_._1 == "orders.custkey_fk").get
    assert(fk._2 === expected)
    assert(expected > 0 && fk._4 === 0L,
      "planted hole produced no violations — fail branch is vacuous")
    // totals match the true table sizes
    assert(rows.find(_._1 == "lineitem.orderkey_fk").get._3 ===
      Tables.lineitem(spark, sf).count())
  }
}
