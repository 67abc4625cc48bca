package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skyline operator contracts (Skyline.scala): the bucketed two-level
  * dominance prune must equal the brute-force Pareto frontier. */
class SkylineSpec extends AnyFunSuite {
  import TestSpark._

  test("skyline equals brute-force dominance over all point pairs") {
    val got = SparkEntry.queries("q_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force in memory over the same quarter-slice aggregate
    val pts = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 4 === 0)
      .groupBy(col("o_custkey").as("c"))
      .agg(
        (sum(col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("x"),
        max(datediff(col("o_orderdate").cast(
            org.apache.spark.sql.types.DateType),
          lit("1970-01-01").cast(org.apache.spark.sql.types.DateType)))
          .cast(org.apache.spark.sql.types.LongType).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.sortBy { case (c, x, _) => (-x, c) }
    assert(got.toSeq === expect.toSeq)
    // the frontier is non-trivial (at least one point, strictly fewer
    // than the input) and strictly decreasing in y as x falls
    assert(got.nonEmpty && got.length < pts.length)
    got.sliding(2).foreach {
      case Array((_, x1, y1), (_, x2, y2)) =>
        assert(x1 >= x2)
        if (x1 > x2) assert(y2 > y1, "frontier must trade spend for recency")
      case _ => ()
    }
  }
}
