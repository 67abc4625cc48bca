package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleaningSpec extends AnyFunSuite {
  import TestSpark._

  test("P11 null-keeping outlier filter: isNull branch vs plain < (SQL 3VL)") {
    import spark.implicits._
    // reference semantics (R: x < k | is.na(x)) keep NULL rows; a plain
    // SQL `x < k` predicate silently drops them (NULL < k → NULL → filtered)
    val df = Seq[(Int, Option[Double])](
      (1, Some(10.0)), (2, Some(200.0)), (3, None), (4, Some(50.0)), (5, None)
    ).toDF("id", "x")
    val plain = df.filter(col("x") < 100).count()
    val keepNull = df.filter(col("x") < 100 || col("x").isNull).count()
    assert(plain === 2)    // NULL rows silently dropped
    assert(keepNull === 4) // NULL rows kept — the reference's semantics
  }

  test("P13/P14: na.drop + null-split partitions cover all rows exactly once") {
    val total = Tables.events(spark, sf).count()
    val kept = SparkEntry.queries("q_na_drop")(spark, sf)
      .collect()(0).getLong(0)
    val split = SparkEntry.queries("q_null_split")(spark, sf)
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(split.values.sum === total)
    assert(kept <= split(false)) // na.drop also drops user2-null rows
  }

  test("P15/P16: limit slice is deterministic and row index is dense") {
    val a = SparkEntry.queries("q_limit_slice")(spark, sf).collect()
    val b = SparkEntry.queries("q_limit_slice")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    val idx = SparkEntry.queries("q_row_index")(spark, sf)
      .select("idx").collect().map(_.getLong(0))
    assert(idx.toSeq === (1L to idx.length).toSeq)
  }

  test("P5/P7: dropped column stays out of the parquet ReadSchema (pruning)") {
    val plan = SparkEntry.queries("q_select_rename")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("c_acctbal"), "c_acctbal must be pruned from scan")
    assert(!plan.contains("c_nationkey"), "c_nationkey must be pruned from scan")
  }
}
