package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.control.NonFatal

/** Dev-only micro-breakdown probe for the r20 optimization round: times
  * labeled sub-plans and restructured VARIANTS through the noop sink
  * (guide §1.4) so each candidate change is measured before any operator
  * is touched. NOT part of the driver contract; delete or ignore after
  * the round. Select probe groups with SPARK_GRAFT_PROBE=tr,op,pj,...
  * (default: all).
  */
object DevProbe {
  def time(label: String, warm: Int = 1, reps: Int = 5)(f: => DataFrame): Unit = {
    val spark = SparkSession.active
    (1 to warm).foreach { _ =>
      f.write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      sec
    }
    println(f"[probe] $label%-44s ${ts.sorted.apply((reps - 1) / 2)}%.3f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val groups = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(",").map(_.trim).toSet)
    def want(g: String): Boolean = groups.forall(_.contains(g))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).write.mode("overwrite")
        .format("noop").save()
      catch { case NonFatal(_) => () }
    }

    if (want("tr")) {
      time("tr: current (lazy e, lazy oe)") {
        graft.operators.Graph.triangles(spark, sfDir)
      }
    }

    if (want("op")) {
      time("op: current (basket arrays)") {
        graft.operators.Basket.coPurchase(spark, sfDir)
      }
    }

    if (want("pj")) {
      time("pj: current") {
        graft.operators.Dedup.prefixSimJoin(spark, sfDir)
      }
    }
    // pj stage breakdown: rebuild the pipeline stage by stage so the
    // 4.4 s attributes to tokenize/arr-build vs candidate join vs verify
    if (want("pjb")) {
      import graft.operators.Dedup
      def toks0 = Dedup.corpus(spark, sfDir)
        .filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), explode(array_distinct(
          split(regexp_replace(lower(col("text")), "\\s+", " "), " ")))
          .as("t"))
        .filter(length(col("t")) > 0)
      def arrOf(ck: Boolean) = {
        val dfreq = toks0.groupBy("t").agg(count(lit(1)).as("df"))
        val keyed = toks0.join(dfreq, "t")
          .select(col("doc_id"),
            format_string("%012d|%s", col("df"), col("t")).as("k"))
        val a = keyed.groupBy("doc_id")
          .agg(sort_array(collect_list(col("k"))).as("ks"))
          .withColumn("s", size(col("ks")).cast(LongType))
        if (ck) a.localCheckpoint(true) else a
      }
      def preOf(arr: DataFrame) = arr.select(col("doc_id"), col("s"),
        posexplode(expr("slice(ks, 1, int(s - (9*s + 9) div 10 + 1))")))
        .select(col("doc_id"), col("s"), (col("pos") + 1L).as("p"),
          col("col").as("k"))
      def candOf(pre: DataFrame) = pre.as("x").join(pre.as("y"),
          col("x.k") === col("y.k") && col("x.doc_id") < col("y.doc_id") &&
            col("x.s") * 9L <= col("y.s") * 10L &&
            col("y.s") * 9L <= col("x.s") * 10L &&
            lit(19L) * (lit(1L) +
              least(col("x.s") - col("x.p"), col("y.s") - col("y.p"))) >=
              lit(9L) * (col("x.s") + col("y.s")))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      time("pjb: tokenize+explode only") { toks0 }
      time("pjb: dfreq only") {
        toks0.groupBy("t").agg(count(lit(1)).as("df"))
      }
      time("pjb: arr build (incl eager ckpt)") { arrOf(true) }
      time("pjb: arr -> cand (arr prebuilt)") {
        val arr = arrOf(true); candOf(preOf(arr))
      }
      time("pjb: verify joins, sizes only (no arrays)") {
        val arr = arrOf(true)
        val cand = candOf(preOf(arr))
        val av = arr.select(col("doc_id").as("a"), col("s").as("sa"))
        val bv = arr.select(col("doc_id").as("b"), col("s").as("sb"))
        cand.join(av, "a").join(bv, "b")
          .filter(col("sa") * 10L >= (col("sa") + col("sb")) * 4L)
          .select(col("a"), col("b"))
      }
      time("pjb: verify joins + arrays, no intersect") {
        val arr = arrOf(true)
        val cand = candOf(preOf(arr))
        val av = arr.select(col("doc_id").as("a"), col("ks").as("ka"),
          col("s").as("sa"))
        val bv = arr.select(col("doc_id").as("b"), col("ks").as("kb"),
          col("s").as("sb"))
        cand.join(av, "a").join(bv, "b")
          .withColumn("inter",
            (size(col("ka")) + size(col("kb"))).cast(LongType))
          .filter(col("inter") > 0L)
          .select(col("a"), col("b"), col("inter"))
      }
      time("pjb: full minus rollup (pairs)") {
        val arr = arrOf(true)
        val cand = candOf(preOf(arr))
        val av = arr.select(col("doc_id").as("a"), col("ks").as("ka"),
          col("s").as("sa"))
        val bv = arr.select(col("doc_id").as("b"), col("ks").as("kb"),
          col("s").as("sb"))
        cand.join(av, "a").join(bv, "b")
          .withColumn("inter",
            size(array_intersect(col("ka"), col("kb"))).cast(LongType))
          .withColumn("uni", col("sa") + col("sb") - col("inter"))
          .filter(col("inter") * 10L >= col("uni") * 9L)
          .select(col("a"), col("b"),
            round(col("inter").cast(DoubleType) /
              col("uni").cast(DoubleType), 6).as("jac"))
      }
    }

    // sb/s4/id/e2/st: the winning r20 variants were promoted to the
    // production operators (see OPTIMIZATION_r20.md for the per-variant
    // medians); these probes now time the current production shapes.
    if (want("sb")) {
      time("sb: current substring_dedup") {
        graft.operators.Dedup.substringDedup(spark, sfDir)
      }
    }
    if (want("s4")) {
      time("s4: current span_mask") {
        graft.operators.Dedup.spanMask(spark, sfDir)
      }
    }
    if (want("id")) {
      time("id: current incr_dedup") {
        graft.operators.Dedup.incrementalDedup(spark, sfDir)
      }
    }
    if (want("e2")) {
      time("e2: current e2e") {
        graft.ml.E2eChain.query(spark, sfDir)
      }
    }
    if (want("st")) {
      time("st: current stratified") {
        graft.operators.Curation.stratifiedSample(spark, sfDir)
      }
    }
    if (want("x")) {
      time("x: current (occFp + toks lazy-ckpt)") {
        graft.operators.Dedup.suffixDedup(spark, sfDir)
      }
    }
    if (want("qn")) {
      def qnVariant(ck: Boolean): DataFrame = {
        val ps = (1 until 10).map(i => s"0.${i}D").mkString(", ")
        val base0 = Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag").as("g"),
            (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
              .cast(LongType).as("c"))
        val base = if (ck) base0.localCheckpoint(eager = false) else base0
        val cuts = base.groupBy("g")
          .agg(expr(s"percentile_exact(CAST(c AS DOUBLE), array($ps))")
            .as("bs"))
        val cells = base.join(broadcast(cuts), "g")
          .select(col("g"), col("c"),
            (expr("size(filter(bs, b -> CAST(c AS DOUBLE) > b))") + 1)
              .cast(LongType).as("decile"))
          .groupBy("g", "decile")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("decile")
        cells
          .withColumn("tn", sum(col("n")).over(w))
          .withColumn("ts", sum(col("sc")).over(w))
          .select(col("g"), col("decile"), col("n"),
            round(col("sc").cast(DoubleType) / col("n").cast(DoubleType)
              / 100.0, 4).as("group_mean"),
            round(col("ts").cast(DoubleType) / col("tn").cast(DoubleType)
              / 100.0, 4).as("ref_mean"),
            round(col("ts").cast(DoubleType) / col("tn").cast(DoubleType)
              / 100.0
              - col("sc").cast(DoubleType) / col("n").cast(DoubleType)
              / 100.0, 4).as("adjustment"))
          .orderBy("g", "decile")
      }
      time("qn: current (recompute)") { qnVariant(false) }
      time("qn: base lazy-ckpt") { qnVariant(true) }
    }
    if (want("eh")) {
      def ehVariant(ck: Boolean): DataFrame = {
        val ps = (1 until 10).map(i => s"0.${i}D").mkString(", ")
        val li0 = Tables.lineitem(spark, sfDir)
          .select(col("l_extendedprice").as("x"))
        val li = if (ck) li0.localCheckpoint(eager = false) else li0
        val bounds = li.agg(
          expr(s"percentile_exact(CAST(x AS DOUBLE), array($ps))").as("bs"))
        li.crossJoin(broadcast(bounds))
          .select(col("x"),
            (expr("size(filter(bs, b -> x > b))") + 1).cast(LongType)
              .as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            round(min(col("x")), 2).as("lo"),
            round(max(col("x")), 2).as("hi"))
          .orderBy("bucket")
      }
      time("eh: current (recompute)") { ehVariant(false) }
      time("eh: x lazy-ckpt") { ehVariant(true) }
    }
    if (want("wi2")) {
      def wiVariant(ck: Boolean): DataFrame = {
        val cents0 = Tables.orders(spark, sfDir)
          .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("c"))
        val cents = if (ck) cents0.localCheckpoint(eager = false) else cents0
        val bounds = cents.agg(
          expr("percentile_exact(CAST(c AS DOUBLE), array(0.05D, 0.95D))")
            .as("bs"))
          .select(round(col("bs").getItem(0)).cast(LongType).as("b_lo"),
            round(col("bs").getItem(1)).cast(LongType).as("b_hi"))
        cents.crossJoin(broadcast(bounds))
          .select(col("c"), col("b_lo"), col("b_hi"),
            least(greatest(col("c"), col("b_lo")), col("b_hi")).as("w"))
          .groupBy("b_lo", "b_hi")
          .agg(count(lit(1)).as("n"),
            sum(when(col("c") < col("b_lo"), 1L).otherwise(0L))
              .as("n_clip_lo"),
            sum(when(col("c") > col("b_hi"), 1L).otherwise(0L))
              .as("n_clip_hi"),
            sum(col("w")).as("sum_winsorized_cents"))
      }
      time("wi2: current (recompute)") { wiVariant(false) }
      time("wi2: cents lazy-ckpt") { wiVariant(true) }
    }
    if (want("an")) {
      def epochDay(c: org.apache.spark.sql.Column) =
        datediff(c.cast(DateType), lit("1970-01-01").cast(DateType))
          .cast(LongType)
      def anomalyVariant(ckptDaily: Boolean): DataFrame = {
        val daily0 = Tables.events(spark, sfDir)
          .select(col("event_id"), epochDay(col("ts")).as("d"))
          .filter(!(col("d") % 16 === 5 && col("event_id") % 4 =!= 0))
          .groupBy("d").agg(count(lit(1)).as("n"))
        val daily = if (ckptDaily) daily0.localCheckpoint(eager = false)
                    else daily0
        val med = daily.agg(
          expr("percentile(CAST(n AS DOUBLE), 0.5)").as("med"))
        val dev = daily.crossJoin(broadcast(med))
          .select(col("d"), col("n"), col("med"),
            abs(col("n").cast(DoubleType) - col("med")).as("dev"))
        val mad = dev.agg(
          expr("percentile(CAST(dev AS DOUBLE), 0.5)").as("mad"))
        dev.crossJoin(broadcast(mad))
          .select(col("d").as("epoch_day"), col("n"),
            round(col("med"), 4).as("median"),
            round(col("mad"), 4).as("mad"),
            (col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
              .cast(LongType).as("is_anomaly"))
          .orderBy("epoch_day")
      }
      time("an: current (recompute)") { anomalyVariant(false) }
      time("an: daily lazy-ckpt") { anomalyVariant(true) }
    }
    if (want("wi")) {
      time("wi: current (percentile_exact array bounds)") {
        graft.operators.Relational.winsorize(spark, sfDir)
      }
    }
    spark.stop()
  }
}
