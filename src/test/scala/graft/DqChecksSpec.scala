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

  test("col profile: one row per column, counters independently recounted") {
    val rows = SparkEntry.queries("q_col_profile")(spark, sf).collect()
    val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus", "o_totalprice")
    assert(rows.map(_.getString(0)).toSeq === cols) // sorted, complete
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    rows.foreach { r =>
      assert(r.getLong(1) === total, s"${r.getString(0)} n_rows")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= total)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= total)
      assert(r.getString(4) <= r.getString(5) || r.getString(0) == "o_totalprice",
        s"${r.getString(0)} min_repr > max_repr") // string order; cents skip
    }
    // spot-recount one column's distinct + null counters independently
    val ok = rows.find(_.getString(0) == "o_orderkey").get
    assert(ok.getLong(3) === orders.select("o_orderkey").distinct().count())
    assert(ok.getLong(2) === orders.filter(col("o_orderkey").isNull).count())
    // the primary key must profile as unique and the repr pair must round-trip
    assert(ok.getLong(3) === total)
    assert(ok.getString(4).toLong <= ok.getString(5).toLong)
    // cents repr: numeric order must hold after parsing
    val tp = rows.find(_.getString(0) == "o_totalprice").get
    assert(tp.getString(4).toLong <= tp.getString(5).toLong)
  }
}
