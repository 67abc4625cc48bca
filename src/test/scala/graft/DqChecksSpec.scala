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
    // numeric columns render as plain integer strings (ids; DECIMAL cents
    // for o_totalprice) — compare them PARSED, not lexicographically:
    // string order would false-fail e.g. min '2' vs max '10'
    val numericCols = Set("o_orderkey", "o_custkey", "o_totalprice")
    rows.foreach { r =>
      assert(r.getLong(1) === total, s"${r.getString(0)} n_rows")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= total)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= total)
      if (numericCols(r.getString(0)))
        assert(r.getString(4).toLong <= r.getString(5).toLong,
          s"${r.getString(0)} min_repr > max_repr (numeric)")
      else
        assert(r.getString(4) <= r.getString(5),
          s"${r.getString(0)} min_repr > max_repr") // date/string: lexicographic IS the order
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

  test("benford screen: digits recounted, shares conserve, deviation real") {
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    // counts partition the table
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === total)
    // leading digit independently recounted for one digit
    val d1 = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast(org.apache.spark.sql.types.LongType).as("c"))
      .collect().map(_.getLong(0).toString.head.asDigit)
      .count(_ == 1).toLong
    assert(rows.find(_._1 == 1L).get._2 === d1)
    // shares + excess are consistent; the synthetic uniform prices must
    // FAIL Benford visibly (that is the forensic point of the gauge)
    rows.foreach { case (d, n, share, bf, ex) =>
      assert(math.abs(share - n.toDouble / total) < 1e-6, s"digit $d share")
      assert(math.abs(ex - (share - bf)) < 2e-6, s"digit $d excess")
    }
    assert(rows.exists(r => math.abs(r._5) > 0.05),
      "no digit deviates >5pp — uniform prices should fail Benford loudly")
  }
}
