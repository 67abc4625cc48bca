package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VersioningSpec extends AnyFunSuite {
  import TestSpark._

  test("merge upsert: profile totals match the planted edit script exactly") {
    val prof = SparkEntry.queries("q_merge_upsert")(spark, sf).collect()
    assert(prof.length <= 16)
    val d = Tables.documents(spark, sf)
    val nBase = d.count()
    val nDel = d.filter(col("doc_id") % 10 === 0).count()
    val nIns = d.filter(col("doc_id") % 9 === 0).count()
    val nUpd =
      d.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 0).count()
    // row count: base - deletes + inserts
    assert(prof.map(_.getLong(1)).sum === nBase - nDel + nIns)
    // total text length telescopes: -deleted lens +inserted copies' lens
    // +3 chars (" v2") per updated doc
    val lenBase = d.agg(sum(length(col("text")))).head().getLong(0)
    val lenDel = d.filter(col("doc_id") % 10 === 0)
      .agg(sum(length(col("text")))).head().getLong(0)
    val lenIns = d.filter(col("doc_id") % 9 === 0)
      .agg(sum(length(col("text")))).head().getLong(0)
    assert(prof.map(_.getLong(2)).sum ===
      lenBase - lenDel + lenIns + 3L * nUpd)
    // inserted id space is visible: some bucket's max_id is above 1M
    assert(prof.map(_.getLong(4)).max >= 1000000L)
  }

  test("scd2: runs collapse, re-stated values do not open versions") {
    import spark.implicits._
    // u1: A A B A  → versions A, B, A (middle A-restate collapses);
    // u2: single event → one open version
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      (2L, 10L, 5L, "X"))
      .toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = graft.operators.Versioning.scd2From(log).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(out.count(_._1 == 1L) === 3)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq("A", "B", "A"))
    assert(out.count(_._1 == 2L) === 1)
    // exactly one current row per user; only the last is open
    assert(out.count(_._5 == 1L) === 2)
    assert(out.filter(_._4.isEmpty).forall(_._5 == 1L))
  }

  test("incremental agg: merge path data-exercised; totals = full recompute") {
    import graft.operators.Versioning.IncrAggCutoverDay
    val out = SparkEntry.queries("q_incr_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val o = Tables.orders(spark, sf)
    // global conservation: counts and exact cents survive the merge
    assert(out.map(_._4).sum === o.count())
    val fullCents = o.agg((sum(col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
      .cast(org.apache.spark.sql.types.LongType)).head().getLong(0)
    assert(out.map(_._3).sum === fullCents)
    // the cutover month must exist on BOTH sides of the split, so the
    // union really merges two partial states for it
    val cut = lit(IncrAggCutoverDay)
      .cast(org.apache.spark.sql.types.TimestampType)
    val cutMonth = IncrAggCutoverDay.substring(0, 7)
    val inMonth = o.filter(
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
        === cutMonth)
    assert(inMonth.filter(col("o_orderdate") < cut).count() > 0)
    assert(inMonth.filter(col("o_orderdate") >= cut).count() > 0)
    // and its merged row carries the month's full count
    val cutRows = out.filter(_._2 == cutMonth)
    assert(cutRows.map(_._4).sum === inMonth.count())
  }

  test("cascade delete: per-table audit matches a direct two-hop recount") {
    val rows = SparkEntry.queries("q_cascade_delete")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map(t => t._1 -> t).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem"))
    rows.values.foreach { case (n, total, del, kept) =>
      assert(kept === total - del, s"$n audit does not balance")
      assert(del > 0, s"$n: planted tombstones cascaded to nothing")
    }
    // direct recount: orders owned by a tombstoned customer, lineitems of
    // those orders via the customer key carried through
    val o = Tables.orders(spark, sf)
    val delOrders = o.filter(col("o_custkey") % 13 === 0)
    assert(rows("orders")._3 === delOrders.count())
    val li = Tables.lineitem(spark, sf)
      .join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    assert(rows("lineitem")._3 ===
      li.filter(col("o_custkey") % 13 === 0).count())
    assert(rows("customer")._2 === Tables.customer(spark, sf).count())
  }

  test("scd2 on testdata: intervals tile each user's history gaplessly") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), Option(r.getTimestamp(3)),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, v) =>
      val sorted = v.sortBy(_._2.getTime)
      // each version closes exactly where the next opens; only the last open
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3.contains(b._2), s"interval gap for user $u")
      }
      assert(sorted.init.forall(_._4 == 0L) && sorted.last._4 == 1L)
      assert(sorted.last._3.isEmpty)
    }
    // versions are bounded by the user's event count
    val evCount = Tables.events(spark, sf).count()
    assert(rows.length <= evCount)
  }
}
