package graft

import org.apache.spark.sql.functions._
import graft.operators.RareCategory
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  import TestSpark._

  test("J1 left join keeps unmatched probe rows (NULL segment group exists)") {
    val rows = SparkEntry.queries("q_left_join")(spark, sf).collect()
    val nullGroup = rows.filter(_.isNullAt(0))
    assert(nullGroup.length === 1, "expected a NULL-segment group")
    assert(nullGroup(0).getAs[Long]("matched") === 0)
    // total across groups = all orders (left join drops nothing)
    assert(rows.map(_.getAs[Long]("cnt")).sum === Tables.orders(spark, sf).count())
  }

  test("U1 union row count = sum of the parts (SURVEY §5.3)") {
    val u = SparkEntry.queries("q_union")(spark, sf)
    val perSrc = u.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("customer") ===
      Tables.customer(spark, sf).select("c_mktsegment").distinct().count())
    assert(perSrc("orders") ===
      Tables.orders(spark, sf).select("o_orderpriority").distinct().count())
  }

  test("W1 ntile assigns near-equal bucket sizes covering all rows") {
    val d = SparkEntry.queries("q_ntile")(spark, sf).collect()
    val total = Tables.customer(spark, sf).count()
    assert(d.map(_.getAs[Long]("cnt")).sum === total)
    assert(d.length === 10)
    val sizes = d.map(_.getAs[Long]("cnt"))
    assert(sizes.max - sizes.min <= 1)
  }

  test("O3 top-k is ordered desc and sized k") {
    val t = SparkEntry.queries("q_topk")(spark, sf)
      .collect().map(_.getAs[Double]("acctbal"))
    assert(t.length === 15)
    assert(t.toSeq === t.sorted(Ordering[Double].reverse).toSeq)
  }

  test("semi + anti joins partition the probe side exactly") {
    // same build side (urgent orders) on both: semi ∪ anti = all customers
    val c = Tables.customer(spark, sf)
    def total(q: String) = SparkEntry.queries(q)(spark, sf)
      .agg(coalesce(sum("cnt"), lit(0L))).collect()(0).getLong(0)
    assert(total("q_semi_join") + total("q_anti_join") === c.count())
    // and the semi never duplicates a multi-match probe row
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val semi = c.join(urgent, c("c_custkey") === urgent("o_custkey"),
      "left_semi")
    assert(semi.count() === semi.select("c_custkey").distinct().count())
  }

  test("full outer keeps left-only, both and right-only days") {
    val rows = SparkEntry.queries("q_full_outer")(spark, sf).collect()
    assert(rows.exists(r => !r.isNullAt(1) && r.isNullAt(2)), "left-only")
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)), "both")
    assert(rows.exists(r => r.isNullAt(1) && !r.isNullAt(2)), "right-only")
  }

  test("rollup subtotals and grand total are consistent with leaves") {
    val rows = SparkEntry.queries("q_rollup")(spark, sf).collect()
    val leaves = rows.filter(r => r.getAs[Long]("g_region") == 0 &&
      r.getAs[Long]("g_nation") == 0)
    val regionSub = rows.filter(r => r.getAs[Long]("g_region") == 0 &&
      r.getAs[Long]("g_nation") == 1)
    val grand = rows.filter(_.getAs[Long]("g_region") == 1)
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("cnt") ===
      leaves.map(_.getAs[Long]("cnt")).sum)
    assert(regionSub.map(_.getAs[Long]("cnt")).sum ===
      leaves.map(_.getAs[Long]("cnt")).sum)
    assert(grand(0).getAs[Long]("sum_price_cents") ===
      leaves.map(_.getAs[Long]("sum_price_cents")).sum)
  }

  test("cube emits all four grouping sets consistently") {
    val rows = SparkEntry.queries("q_cube")(spark, sf).collect()
    def cnt(gs: Long, gp: Long) = rows.filter(r =>
      r.getAs[Long]("g_segment") == gs && r.getAs[Long]("g_priority") == gp)
      .map(_.getAs[Long]("cnt")).sum
    val leaves = cnt(0, 0)
    assert(leaves > 0)
    // both margins and the grand total each re-partition the same rows
    assert(cnt(0, 1) === leaves, "segment margin")
    assert(cnt(1, 0) === leaves, "priority margin")
    assert(cnt(1, 1) === leaves, "grand total")
  }

  test("set ops: tags partition the two distinct day-sets exactly") {
    val rows = SparkEntry.queries("q_set_ops")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
    assert(rows.distinct.length === rows.length) // distinct semantics
    val byTag = rows.groupBy(_._2).map { case (t, v) => t -> v.map(_._1).toSet }
    val o = Tables.orders(spark, sf)
    import org.apache.spark.sql.functions.col
    def days(p: String) = o.filter(col("o_orderpriority") === p)
      .select(col("o_orderdate")
        .cast(org.apache.spark.sql.types.DateType)).distinct().collect()
      .map(_.getDate(0).toString).toSet
    val u = days("1-URGENT"); val h = days("2-HIGH")
    assert(byTag.getOrElse("both", Set()) === (u intersect h))
    assert(byTag.getOrElse("urgent_only", Set()) === (u diff h))
    assert(byTag.getOrElse("high_only", Set()) === (h diff u))
  }

  test("latest-per-key aggregate argmax equals the window rank-1 form") {
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("q_latest_order")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val win = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"),
        datediff(col("o_orderdate")
          .cast(org.apache.spark.sql.types.DateType),
          lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
          .cast(org.apache.spark.sql.types.LongType).as("day"),
        col("o_orderkey"),
        (col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === win.toSet)
    assert(out.length === out.map(_._1).distinct.length) // one row per key
  }

  test("set ops ALL: multiplicities are min'd / subtracted per day") {
    val out = SparkEntry.queries("q_set_ops_all")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getLong(2))).toMap
    def dayCounts(p: String) = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === p)
      .groupBy(col("o_orderdate").cast(org.apache.spark.sql.types.DateType)
        .as("day")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val u = dayCounts("1-URGENT")
    val h = dayCounts("2-HIGH")
    val expected = ((u.keySet ++ h.keySet).flatMap { d =>
      val (nu, nh) = (u.getOrElse(d, 0L), h.getOrElse(d, 0L))
      Seq(("both", d) -> math.min(nu, nh),
        ("urgent_only", d) -> math.max(nu - nh, 0L),
        ("high_only", d) -> math.max(nh - nu, 0L))
    }).filter(_._2 > 0).toMap
    assert(out === expected)
    // bag semantics must differ from set semantics somewhere
    assert(out.exists(_._2 > 1), "no day with multiplicity > 1 — vacuous")
  }

  test("null-safe join: the NULL bucket matches; plain equi would drop it") {
    val rows = SparkEntry.queries("q_nullsafe_join")(spark, sf).collect()
    assert(rows.length === 5) // digits 1,2,4,5 + the NULL bucket
    val nullRow = rows.filter(_.getLong(1) == 1L)
    assert(nullRow.length === 1, "exactly one matched NULL-key row")
    // the null bucket is MATCHED: both sides carry real counts
    assert(!nullRow.head.isNullAt(2) && !nullRow.head.isNullAt(3))
    val med = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "3-MEDIUM")
    assert(nullRow.head.getLong(2) ===
      med.filter(col("o_orderkey") % 2 === 0).count())
    assert(nullRow.head.getLong(3) ===
      med.filter(col("o_orderkey") % 2 === 1).count())
  }

  test("rank functions: tie-aware rank, gap-free dense rank, exact prnk") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_rank_funcs")(spark, sf01).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))
    // per segment: rn is exactly 1..5
    rows.groupBy(_._1).foreach { case (s, v) =>
      assert(v.map(_._3).sorted === (1L to 5L), s)
      // ties (same bucketed balance) share rnk/drnk/prnk; after a k-way
      // tie rank jumps by k while dense rank steps by 1
      v.sortBy(_._3).sliding(2).foreach {
        case Array((_, b1, _, k1, d1, p1), (_, b2, _, k2, d2, p2)) =>
          if (b1 == b2) { assert(k1 === k2); assert(d1 === d2)
            assert(p1 === p2) }
          else { assert(k2 > k1); assert(d2 === d1 + 1) }
        case _ => ()
      }
    }
    // hundreds-bucketing must actually produce a tie somewhere in the
    // output — otherwise the tie semantics above were vacuous
    assert(rows.groupBy(r => (r._1, r._2)).exists(_._2.length > 1))
    // percent_rank replays as (rank-1)/(n-1) against independent counts
    val sizes = Tables.customer(spark, sf01)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (s, _, _, rnk, _, prnk) =>
      val expect = (rnk - 1).toDouble / (sizes(s) - 1).toDouble
      assert(math.abs(prnk - expect) < 1e-6, s"$s rank $rnk")
    }
  }

  test("per-group top-k: matches an exact BigDecimal recount per nation") {
    val out = SparkEntry.queries("q_topk_group")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // exact revenue recount per supplier
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map { r =>
        val ep = BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)
        val di = BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)
        r.getLong(0) -> ep * (BigDecimal(1) - di)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val supp = Tables.supplier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val expect = rev.toSeq.map { case (sk, v) =>
      val (sname, nk) = supp(sk)
      (nat(nk), sname, (v * 10000).toLongExact)
    }.groupBy(_._1).toSeq.flatMap { case (n, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
        .map { case ((_, s, r), i) => (n, (i + 1).toLong, s, r) }
    }.sortBy(x => (x._1, x._2))
    assert(out.toSeq === expect)
  }

  test("F12 rare-category model is deterministic and bounded") {
    val d = Tables.documents(spark, sf)
    val m1 = RareCategory.fit(d, "source", 0.045)
    val m2 = RareCategory.fit(d, "source", 0.045)
    assert(m1.frequent.sorted === m2.frequent.sorted)
    // pigeonhole bound: at most 1/threshold frequent categories
    assert(m1.frequent.length <= (1 / 0.045).toInt + 1)
    // transform maps every non-frequent value to Other
    val out = m1.transform(d).select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(out.subsetOf(m1.frequent.toSet + "Other"))
  }
}
