package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

/** Funnel / cohort-retention contracts (Behavior.scala). */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("funnel: strict ordering — steps out of order do NOT convert") {
    // u1 completes in order; u2 purchases BEFORE clicking (no step 3);
    // u3 clicks before viewing (the click can't count — but a later one
    // does); u4 has click/purchase and no view at all (never enters)
    val df = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 30L, "purchase"), (2L, 40L, "click"),
      (3L, 5L, "click"), (3L, 10L, "view"), (3L, 20L, "click"),
      (3L, 25L, "purchase"),
      (4L, 10L, "click"), (4L, 20L, "purchase"))
    val out = Behavior.funnelFrom(df).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 3L, 2 -> 3L, 3 -> 2L)) // u4 never enters
  }

  test("funnel: ties at the same timestamp are not strictly-after") {
    val df = ev((1L, 10L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"))
    val out = Behavior.funnelFrom(df).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(2) === 0L, "same-instant click must not complete step 2")
  }

  test("funnel on testdata: monotone counts, conversions in (0,1]") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    val users = rows.map(_.getLong(2))
    assert(users(0) >= users(1) && users(1) >= users(2))
    assert(users(2) > 0, "testdata should drive some users through all steps")
    rows.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
  }

  test("attribution: conserves purchases and cents; direct branch real") {
    val rows = SparkEntry.queries("q_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    assert(rows.map(_._2).sum === p.count())
    val cents = p.select((col("value")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast(org.apache.spark.sql.types.LongType)).collect()
      .map(_.getLong(0)).sum
    assert(rows.map(_._3).sum === cents)
    // purchases are never credited to themselves, and first-event
    // purchases fall into the real 'direct' bucket
    assert(!rows.map(_._1).contains("purchase"))
    assert(rows.find(_._1 == "direct").exists(_._2 > 0))
  }

  test("ab test: moments and Welch z match an in-memory recount") {
    val r = SparkEntry.queries("q_ab_test")(spark, sf).head()
    val cents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0) % 2,
        BigDecimal(x.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100))
      .map { case (v, c) => (v, c.toLong) }
    def side(v: Long) = cents.filter(_._1 == v).map(_._2)
    val (a, b) = (side(0), side(1))
    assert(r.getLong(0) === a.length && r.getLong(1) === b.length)
    assert(r.getLong(2) === a.sum && r.getLong(3) === b.sum)
    def mean(x: Array[Long]) = x.sum.toDouble / x.length
    def variance(x: Array[Long]) = {
      val q = x.map(c => c.toDouble * c).sum
      (q - x.sum.toDouble * x.sum / x.length) / (x.length - 1)
    }
    val z = (mean(b) - mean(a)) /
      math.sqrt(variance(a) / a.length + variance(b) / b.length)
    assert(math.abs(r.getDouble(5) - z) < 1e-4)
    // the planted assignment is balanced-ish, so z is a small number,
    // not an artifact of tiny samples
    assert(a.length > 50 && b.length > 50)
  }

  test("streaks: distribution equals an in-memory gaps-and-islands recount") {
    val out = SparkEntry.queries("q_streaks")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = Tables.events(spark, sf)
      .select(col("user_id"), datediff(col("ts")
        .cast(org.apache.spark.sql.types.DateType),
        lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
        .cast(org.apache.spark.sql.types.LongType)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val expect = days.groupBy(_._1).toSeq.map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      var best = 1L; var cur = 1L
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) {
          if (w(1) == w(0) + 1) { cur += 1; best = math.max(best, cur) }
          else cur = 1
        }
      }
      best
    }.groupBy(x => x).map { case (len, xs) => len -> xs.size.toLong }
    assert(out === expect)
  }

  test("markov: transition counts and row-normalized p match a recount") {
    val rows = SparkEntry.queries("q_markov")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val seq = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = seq.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }
    val counts = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.view.mapValues(_._1).toMap === counts)
    val rowTotals = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    rows.foreach { case ((p, _), (n, prob)) =>
      assert(math.abs(prob - n.toDouble / rowTotals(p)) < 1e-5)
    }
  }

  test("session paths: top paths equal an in-memory sessionization recount") {
    val out = SparkEntry.queries("q_session_paths")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // executable spec: sessionize each user's (ts, event_id)-sorted stream
    // with the same >= gap rule, then rebuild the full path table
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val acc = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)])
      var prev = Long.MinValue
      var first = true
      for (r <- sorted) {
        if (!first && r._2 - prev >= Behavior.SessionGapUs)
          acc += scala.collection.mutable.ArrayBuffer.empty
        acc.last += r
        prev = r._2
        first = false
      }
      acc.map(_.toSeq)
    }.toSeq
    // the gaps-and-islands sessionizer and session_window(ts, 30 min) must
    // agree on what a session IS (same gap, same >= boundary)
    val swCount = graft.streaming.EventWindows.sessions(spark, sf).count()
    assert(sessions.size.toLong === swCount,
      "gaps-and-islands session count != session_window session count")
    val table = sessions.groupBy(
        _.take(Behavior.PathMaxEvents).map(_._4).mkString(">"))
      .map { case (path, ss) =>
        val conv = ss.count(_.exists(_._4 == "purchase")).toLong
        (path, ss.size.toLong,
          ss.map(_.head._1).distinct.size.toLong, conv,
          ss.map(_.size).max.toLong,
          BigDecimal(conv.toDouble / ss.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      .sortBy { case (p, n, _, _, _, _) => (-n, p) }
      .take(Behavior.TopPaths)
    assert(out.toSeq === table)
  }

  test("chisq: margins conserve the stream; contributions recompute") {
    val rows = SparkEntry.queries("q_chisq")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum === total)
    val rowT = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { case (t, v, o, e, c) =>
      val exp = rowT(t).toDouble * colT(v) / total
      assert(math.abs(e - exp) < 1e-5)
      assert(math.abs(c - (o - exp) * (o - exp) / exp) < 1e-5)
    }
  }

  test("time-weighted: weighted means match an in-memory recount") {
    val out = SparkEntry.queries("q_time_weighted")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val seq = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val weighted = seq.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._3))
      s.zip(s.tail).map { case (a, b) => (a._4, b._2 - a._2, a._5) }
    }
    val byType = weighted.groupBy(_._1)
    assert(out.keySet === byType.keySet)
    byType.foreach { case (t, ws) =>
      val (n, dur, twa) = out(t)
      assert(n === ws.size.toLong)
      assert(dur === ws.map(_._2).sum)
      val exp = ws.map(w => BigInt(w._2) * BigInt(w._3)).sum.toDouble /
        ws.map(_._2).sum.toDouble
      assert(math.abs(twa - exp) < 1e-4)
    }
  }

  test("concurrency: per-day peak equals a brute-force interval sweep") {
    val out = SparkEntry.queries("q_concurrency")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val iv = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast(org.apache.spark.sql.types.DateType),
          lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
          .cast(org.apache.spark.sql.types.LongType),
        unix_micros(col("ts"))).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((u, d), xs) =>
        (d, xs.map(_._2).min, xs.map(_._2).max)
      }.toSeq
    val expect = iv.groupBy(_._1).map { case (d, ivs) =>
      // closed-interval sweep: count active at every start point
      val peak = ivs.map { case (_, s, _) =>
        ivs.count { case (_, s2, e2) => s2 <= s && s <= e2 }
      }.max.toLong
      d -> (ivs.size.toLong, peak)
    }
    assert(out === expect)
  }

  test("stickiness: wau >= dau, ratio in (0,1], trailing window exact") {
    val rows = SparkEntry.queries("q_stickiness")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val grid = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast(org.apache.spark.sql.types.DateType),
          lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
          .cast(org.apache.spark.sql.types.LongType)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val lo = grid.map(_._2).min
    rows.foreach { case (d, dau, wau, s) =>
      assert(d >= lo + 6, "warm-up days must be clipped")
      val expDau = grid.count(_._2 == d).toLong
      val expWau = grid.filter(g => g._2 >= d - 6 && g._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(dau === expDau, s"day $d dau")
      assert(wau === expWau, s"day $d wau")
      assert(wau >= dau && s > 0 && s <= 1.0)
      assert(math.abs(s - dau.toDouble / wau) < 1e-6)
    }
  }


  test("conversion window: rates match an exact in-memory EXISTS recount") {
    val out = SparkEntry.queries("q_conversion_window")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        datediff(col("ts").cast(org.apache.spark.sql.types.DateType),
          lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
          .cast(org.apache.spark.sql.types.LongType)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val views = ev.filter(_._2 == "view").map(e => (e._1, e._3))
    val purchases = ev.filter(_._2 == "purchase")
    val expect = purchases.groupBy(_._4).map { case (d, ps) =>
      val conv = ps.count { p =>
        views.exists(v => v._1 == p._1 &&
          v._2 >= p._3 - 3600L * 1000000L && v._2 <= p._3)
      }
      d -> (ps.length.toLong, conv.toLong)
    }
    assert(out.keySet === expect.keySet)
    expect.foreach { case (d, (n, c)) =>
      val (on, oc, rate) = out(d)
      assert(on === n && oc === c, s"day $d")
      assert(math.abs(rate - c.toDouble / n) < 1e-6)
    }
    // both branches data-exercised: some purchases convert, some don't
    val (tc, tn) = (expect.values.map(_._2).sum, expect.values.map(_._1).sum)
    assert(tc > 0 && tc < tn, s"degenerate conversion profile $tc/$tn")
  }

  test("cohort retention: offset-0 cell equals cohort size, grid consistent") {
    val rows = SparkEntry.queries("q_cohort")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n) => assert(off >= 0 && n > 0) }
    val byCohort = rows.groupBy(_._1)
    // every user is active in their own first week → the offset-0 cell is
    // the cohort's full size, and no later cell exceeds it
    byCohort.foreach { case (cw, cells) =>
      val c0 = cells.find(_._2 == 0L)
      assert(c0.isDefined, s"cohort $cw missing offset-0 cell")
      cells.foreach { case (_, _, n) => assert(n <= c0.get._3) }
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum === users)
  }

  test("value drift: conservation, exact TVD identity, bins recounted") {
    val rows = SparkEntry.queries("q_value_drift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    val (ta, tb) = (rows.map(_._2).sum, rows.map(_._3).sum)
    // every event lands in exactly one (bin, cohort) cell
    assert(ta + tb === total)
    // both cohorts non-degenerate (midpoint split actually splits)
    assert(ta > 0 && tb > 0)
    // the integer numerators ARE the TVD: sum/(2·ta·tb) ∈ [0, 1], and each
    // numerator must equal |n_a·tb − n_b·ta| recomputed here
    rows.foreach { case (bin, na, nb, sa, sb, num) =>
      assert(num === math.abs(na * tb - nb * ta), s"bin $bin numerator")
      assert(math.abs(sa - na.toDouble / ta) < 1e-6, s"bin $bin share_a")
      assert(math.abs(sb - nb.toDouble / tb) < 1e-6, s"bin $bin share_b")
    }
    val tvd = rows.map(_._6).sum.toDouble / (2.0 * ta * tb)
    assert(tvd >= 0.0 && tvd <= 1.0, s"TVD $tvd out of range")
    // bins are the floor-log2 of positive cents: recount one mid bin
    // independently from the raw table
    val mid = rows.map(_._1).sorted.apply(rows.length / 2)
    val lo = 1L << (mid - 1)
    val hi = (1L << mid) - 1
    val expected = Tables.events(spark, sf)
      .select((col("value").cast(org.apache.spark.sql.types
        .DecimalType(18, 2)) * 100)
        .cast(org.apache.spark.sql.types.LongType).as("c"))
      .filter(col("c") >= lo && col("c") <= hi).count()
    val got = rows.find(_._1 == mid).get
    assert(got._2 + got._3 === expected, s"bin $mid occupancy")
  }

  test("series anomaly: planted outage days flagged, fence not dragged") {
    val rows = SparkEntry.queries("q_anomaly")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length) // one row per day
    // every planted outage day (d % 16 == 5) must flag: 3/4 of the
    // volume is gone, far past the robust fence
    val planted = rows.filter(_._1 % 16 == 5)
    assert(planted.nonEmpty, "no planted day in range")
    planted.foreach { case (d, _, _, _, fl) =>
      assert(fl === 1L, s"planted outage day $d not flagged")
    }
    // MAD robustness: the fence must not have been dragged by the
    // planted days — no clean day flags
    val med = rows.head._3
    assert(rows.head._4 > 0.0) // MAD nonzero: fence is real
    val cleanOut = rows.filter(_._1 % 16 != 5).count(_._5 == 1L)
    assert(cleanOut === 0,
      s"$cleanOut clean days flagged — fence dragged or too tight")
    // and the planted days really did lose ~3/4 of their volume
    planted.foreach { case (d, n, _, _, _) =>
      assert(n < med * 0.5, s"planted day $d volume $n not quartered vs $med")
    }
  }

  test("changepoint: max-score day is the planted shift; flags straddle it") {
    val rows = SparkEntry.queries("q_changepoint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // recompute the planted midpoint from the raw series
    val ds = Tables.events(spark, sf)
      .select(datediff(col("ts").cast(org.apache.spark.sql.types.DateType),
        lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
        .cast(org.apache.spark.sql.types.LongType).as("d"))
      .agg(min("d"), max("d")).collect().head
    val mid = ds.getLong(0) + (ds.getLong(1) - ds.getLong(0) + 1) / 2
    // the maximum |after - before| day must localize the shift: daily
    // noise (~14% at sf0.001) can slide the plateau argmax a day or two,
    // but the true shift day itself must flag and the argmax must sit
    // inside the straddle plateau around it
    val best = rows.maxBy(r => math.abs(r._4 - r._3))
    assert(math.abs(best._1 - mid) <= 2,
      s"argmax ${best._1} not within 2 days of planted midpoint $mid")
    assert(best._5 === 1L, "max-score day not flagged")
    assert(rows.find(_._1 == mid).forall(_._5 == 1L),
      "planted shift day not flagged")
    // flags may only appear where a 7-day window straddles the shift
    rows.filter(_._5 == 1L).foreach { case (d, _, _, _, _) =>
      assert(d > mid - 8 && d < mid + 8,
        s"day $d flagged but no window touches the shift at $mid")
    }
    // the detector discriminates: not every full-window day flags (the
    // 30-day series keeps every such day within +/-8 of the midpoint,
    // so the discrimination claim is the non-flagged complement)
    assert(rows.exists(_._5 == 0L), "every day flagged — no discrimination")
  }

  test("session longer than PathMaxEvents: path truncates, conversion doesn't") {
    // the testdata's longest session is 3 events, so the rn-cap and the
    // convert-anywhere-in-the-FULL-session rule were dead branches in
    // every gate. Plant a 12-event session whose only purchase sits at
    // position 10 — BEYOND the 8-event path head: the path must truncate
    // to the first 8 types, yet the session must still count converted,
    // and max_len must report the full 12.
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val long = (1 to 12).map(i =>
      (1L, ts(i), i.toLong, if (i == 10) "purchase" else s"v$i"))
    val short = Seq((2L, ts(1), 100L, "a"), (2L, ts(2), 101L, "b"))
    val out = Behavior.sessionPathsOf(
      (long ++ short).toDF("user_id", "ts", "event_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    val truncated = (1 to 8).map(i => s"v$i").mkString(">")
    assert(out.toSet === Set(
      (truncated, 1L, 1L, 1L, 12L, 1.0),
      ("a>b", 1L, 1L, 0L, 2L, 0.0)))
  }
}
