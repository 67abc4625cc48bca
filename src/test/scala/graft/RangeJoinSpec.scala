package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("range join matches the naive inequality join on real data") {
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    val naive = c.join(p,
        col("user_id") === col("p_user") &&
        col("click_ts") >= col("purchase_ts") &&
        col("click_ts") < col("purchase_ts") + expr("INTERVAL 1 DAY"))
      .select("user_id", "click_id", "click_ts", "purchase_ts")
    val got = SparkEntry.queries("q_range_join")(spark, sf)
    assert(got.count() === naive.count())
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("boundaries: inclusive start, exclusive end, cross-bucket match") {
    import spark.implicits._
    val probes = Seq(
      (1L, 10L, ts("2024-01-02 00:00:00")), // == start -> in
      (1L, 11L, ts("2024-01-03 00:00:00")), // == end -> out
      // next calendar day bucket, still inside the window -> in
      (1L, 12L, ts("2024-01-02 23:59:59")),
      (2L, 20L, ts("2024-01-02 12:00:00"))  // other key -> out
    ).toDF("k", "id", "t")
    val ivls = Seq(
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))
    ).toDF("k", "s", "e")
    val got = RangeJoin.rangeJoin(probes, ivls, "k", "t", "s", "e")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(10L, 12L))
  }

  test("random intervals incl. multi-bucket spans match a brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val base = 1700000000000L
    val probeRows = Seq.tabulate(300) { i =>
      (rnd.nextInt(6).toLong, i.toLong,
        new Timestamp(base + rnd.nextInt(5000) * 1000L))
    }
    // lengths 0..3000s vs 97s buckets: many intervals span 30+ buckets,
    // exercising the sequence() explosion path well past the 2-bucket case
    val ivlRows = Seq.tabulate(120) { i =>
      val s = base + rnd.nextInt(5000) * 1000L
      (rnd.nextInt(6).toLong, i.toLong, new Timestamp(s),
        new Timestamp(s + rnd.nextInt(3000) * 1000L))
    }
    val probes = probeRows.toDF("k", "pid", "t")
    val ivls = ivlRows.toDF("k", "iid", "s", "e")
    val got = RangeJoin.rangeJoin(probes, ivls, "k", "t", "s", "e",
        bucketUs = 97L * 1000000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expect = (for {
      (pk, pid, pt) <- probeRows
      (ik, iid, is, ie) <- ivlRows
      if pk == ik && pt.getTime >= is.getTime && pt.getTime < ie.getTime
    } yield (pid, iid)).toSet
    assert(got === expect)
    assert(expect.nonEmpty, "fixture must actually produce matches")
  }

  test("reversed/empty intervals are dropped, matching half-open semantics") {
    import spark.implicits._
    val probes = Seq((1L, 10L, ts("2024-01-02 12:00:00"))).toDF("k", "id", "t")
    val ivls = Seq(
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")), // valid
      (1L, ts("2024-01-03 00:00:00"), ts("2024-01-02 00:00:00")), // reversed
      (1L, ts("2024-01-02 12:00:00"), ts("2024-01-02 12:00:00"))  // empty
    ).toDF("k", "s", "e")
    // a reversed interval would make sequence() count DOWN into buckets
    // the residual then filters — correct but untested before; an
    // end==start interval matches nothing under [start, end). Both must
    // produce exactly what the plain inequality join produces: one match.
    val got = RangeJoin.rangeJoin(probes, ivls, "k", "t", "s", "e").collect()
    assert(got.length === 1)
  }

  test("a corrupt far-future interval end fails loudly, not quadratically") {
    import spark.implicits._
    val probes = Seq((1L, 10L, ts("2024-01-02 12:00:00"))).toDF("k", "id", "t")
    val ivls = Seq(
      (1L, ts("2024-01-02 00:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("k", "s", "e")
    val e = intercept[Throwable] {
      RangeJoin.rangeJoin(probes, ivls, "k", "t", "s", "e").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("rangeJoin: interval")),
      s"wrong failure: $e")
  }

  test("join key is refined with the bucket (bounds per-key expansion)") {
    val plan = SparkEntry.queries("q_range_join")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the equi-join must be on (user_id, __bucket), not user_id alone —
    // that refinement is what keeps a hot user from quadratic expansion
    assert(plan.contains("__bucket"), s"bucket key missing from plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
