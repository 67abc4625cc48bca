package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows hit one key — the LA-county shape
    val fact = spark.range(0, 10000)
      .select(when(col("id") % 10 === 0, col("id") % 5)
        .otherwise(lit(1L)).as("k"), col("id"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "v")
    val plain = fact.join(dim, "k").select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
  }

  test("two-phase count matches plain groupBy count") {
    val e = Tables.events(spark, sf)
    val plain = e.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.twoPhaseCount(e, col("event_type"), salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase === plain)
  }
}
