package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // small fixture with every interesting shape: state before/after probe,
  // exact timestamp tie, probe with no preceding state, multi-key
  private lazy val probes = {
    import spark.implicits._
    Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")), // before any state -> NULL
      (1L, 101L, ts("2024-01-01 02:00:00")), // after s1
      (1L, 102L, ts("2024-01-01 03:00:00")), // tie with s2 -> inclusive
      (1L, 103L, ts("2024-01-01 09:00:00")), // after s2 (latest wins)
      (2L, 200L, ts("2024-01-01 05:00:00"))  // other key, after its state
    ).toDF("k", "probe_id", "t")
  }
  private lazy val states = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 01:00:00"), 10.0), // s1
      (1L, ts("2024-01-01 03:00:00"), 20.0), // s2 (ties probe 102)
      (2L, ts("2024-01-01 04:00:00"), 30.0),
      (3L, ts("2024-01-01 00:30:00"), 99.0)  // key with no probes
    ).toDF("k", "t", "v")
  }

  test("as-of picks the latest state at-or-before each probe (inclusive >=)") {
    val got = AsOfJoin.asOf(probes, states, "k", "t", Seq("v"))
      .orderBy("probe_id")
      .collect()
      .map(r => (r.getAs[Long]("probe_id"),
        Option(r.getAs[Timestamp]("asof_t")),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)))
    assert(got.toSeq === Seq(
      (100L, None, None),
      (101L, Some(ts("2024-01-01 01:00:00")), Some(10.0)),
      (102L, Some(ts("2024-01-01 03:00:00")), Some(20.0)), // tie matches
      (103L, Some(ts("2024-01-01 03:00:00")), Some(20.0)),
      (200L, Some(ts("2024-01-01 04:00:00")), Some(30.0))))
  }

  test("stray right-side columns do not leak into the output") {
    // a right side carrying columns that are neither key, time, nor
    // payload: before r6 these rode through the tagged union as all-NULL
    // columns on every output row (latent — in-repo callers pre-project)
    val dirty = states.withColumn("audit_note", lit("ingested"))
      .withColumn("batch_id", lit(42L))
    for (out <- Seq(
        AsOfJoin.asOf(probes, dirty, "k", "t", Seq("v")),
        AsOfJoin.asOfBucketed(probes, dirty, "k", "t", Seq("v"),
          bucketUs = 3600L * 1000000L))) {
      assert(!out.columns.contains("audit_note") &&
        !out.columns.contains("batch_id"),
        s"right-side columns leaked: ${out.columns.mkString(",")}")
      // and the as-of result itself is unchanged by the stray columns
      val clean = AsOfJoin.asOf(probes, states, "k", "t", Seq("v"))
      assert(out.orderBy("probe_id").collect().toSeq ===
        clean.select(out.columns.map(col): _*).orderBy("probe_id")
          .collect().toSeq)
    }
  }

  test("as-of equals the quadratic reference formulation on real data") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    // reference: inequality join + per-probe argmax — O(n*m) per key,
    // fine at test SF, the formulation asOf exists to avoid
    val byLatest = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id")
      .orderBy(col("p_ts").desc)
    val expect = c.join(p.withColumnRenamed("ts", "p_ts")
        .withColumnRenamed("user_id", "p_user"),
        col("user_id") === col("p_user") && col("ts") >= col("p_ts"), "left")
      .withColumn("rn", row_number().over(byLatest))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("p_ts"), col("p_value"))
    val got = AsOfJoin.query(spark, sf)
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    assert(got.count() === c.count(), "left semantics: no probe dropped")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("as-of matches an in-memory reference on seeded random histories") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // dense key space + second-granularity times force collisions and
    // exact probe==state timestamp ties
    val probeRows = Seq.tabulate(400) { i =>
      (rnd.nextInt(8).toLong, i.toLong,
        new Timestamp(1700000000000L + rnd.nextInt(5000) * 1000L))
    }
    val stateRows0 = Seq.tabulate(250) { i =>
      (rnd.nextInt(8).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(5000) * 1000L),
        i.toDouble)
    }
    // unique per (key, time): keep the max value, mirroring query()'s
    // pre-aggregation contract
    val stateRows = stateRows0.groupBy(r => (r._1, r._2.getTime))
      .map { case (_, g) => g.maxBy(_._3) }.toSeq
    val got = AsOfJoin.asOf(
        probeRows.toDF("k", "probe_id", "t"),
        stateRows.toDF("k", "t", "v"), "k", "t", Seq("v"))
      .select("probe_id", "asof_v").collect()
      .map(r => r.getAs[Long]("probe_id") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue))
      .toMap
    val byKey = stateRows.groupBy(_._1)
    val expect = probeRows.map { case (k, id, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(_._2.getTime <= t.getTime)
        .sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(got === expect)
  }

  test("a NULL payload on the latest state row is reported, not skipped") {
    import spark.implicits._
    // ASOF semantics: the newest state row wins AS A UNIT — its NULL
    // payload must surface, never an older state's non-null value
    val probes = Seq((1L, 100L, ts("2024-01-01 05:00:00")))
      .toDF("k", "probe_id", "t")
    val states = Seq(
      (1L, ts("2024-01-01 01:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 03:00:00"), None: Option[Double])
    ).toDF("k", "t", "v")
    for (joined <- Seq(
        AsOfJoin.asOf(probes, states, "k", "t", Seq("v")),
        AsOfJoin.asOfBucketed(probes, states, "k", "t", Seq("v"),
          bucketUs = 3600L * 1000000L))) {
      val r = joined.collect()(0)
      assert(r.getAs[Timestamp]("asof_t") === ts("2024-01-01 03:00:00"))
      assert(r.isNullAt(r.fieldIndex("asof_v")),
        "latest state's NULL payload must win over the older 5.0")
    }
  }

  test("NULL-time state rows never match (ASOF comparison is unknown)") {
    import spark.implicits._
    val probes = Seq((1L, 100L, ts("2024-01-01 05:00:00")))
      .toDF("k", "probe_id", "t")
    val states = Seq(
      (1L, None: Option[Timestamp], Some(7.0)) // t NULL: must be invisible
    ).toDF("k", "t", "v")
    for (joined <- Seq(
        AsOfJoin.asOf(probes, states, "k", "t", Seq("v")),
        AsOfJoin.asOfBucketed(probes, states, "k", "t", Seq("v")))) {
      val r = joined.collect()(0)
      assert(r.isNullAt(r.fieldIndex("asof_t")))
      assert(r.isNullAt(r.fieldIndex("asof_v")))
    }
  }

  test("bucketed as-of is row-identical to the plain as-of on real data") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val plain = AsOfJoin.asOf(c, p, "user_id", "ts", Seq("p_value"))
    // 6h buckets: events span 30 days, so carry-forward crosses ~120
    // buckets including state-free ones
    val bucketed = AsOfJoin.asOfBucketed(c, p, "user_id", "ts",
      Seq("p_value"), bucketUs = 6L * 3600L * 1000000L)
    assert(bucketed.count() === plain.count())
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)
  }

  test("bucketed as-of survives ties, empty buckets and probe-only buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242L)
    val probeRows = Seq.tabulate(300) { i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new Timestamp(1700000000000L + rnd.nextInt(4000) * 1000L))
    }
    val stateRows = Seq.tabulate(150) { i =>
      (rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(4000) * 1000L),
        i.toDouble)
    }.groupBy(r => (r._1, r._2.getTime))
      .map { case (_, g) => g.maxBy(_._3) }.toSeq
    val probes = probeRows.toDF("k", "probe_id", "t")
    val states = stateRows.toDF("k", "t", "v")
    val plain = AsOfJoin.asOf(probes, states, "k", "t", Seq("v"))
    // 97s buckets (prime, misaligned with the 1s grid) over a 4000s span
    val bucketed = AsOfJoin.asOfBucketed(probes, states, "k", "t",
      Seq("v"), bucketUs = 97L * 1000000L)
    assert(bucketed.count() === plain.count())
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)
  }

  test("as-of core is join-free: one window pass, no pair expansion") {
    val plan = AsOfJoin.asOf(probes, states, "k", "t", Seq("v"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
    assert(plan.contains("Window"), "expected the single window pass")
  }
}
