package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only micro-breakdown probe for the r19 optimization round: times
  * labeled sub-plans through the noop sink (guide §1.4) so a hot query's
  * cost can be attributed to its stages before any rewrite. NOT part of
  * the driver contract; delete or ignore after the round. */
object DevProbe {
  def time(label: String, warm: Int = 1, reps: Int = 3)(f: => DataFrame): Unit = {
    (1 to warm).foreach(_ => f.write.mode("overwrite").format("noop").save())
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $label%-40s ${ts.sorted.apply((reps - 1) / 2)}%.3f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      catch { case _: Throwable => () }
    }

    val li = Tables.lineitem(spark, sfDir)
    val ps = (1 until 10).map(i => s"0.${i}D").mkString(", ")

    // --- q_equidepth breakdown ---
    time("eh: bounds percentile (ObjectAgg)") {
      li.agg(expr(s"percentile(CAST(l_extendedprice AS DOUBLE), array($ps))").as("bs"))
    }
    time("eh: bounds via counts+freq percentile") {
      li.select(col("l_extendedprice").as("x")).groupBy("x")
        .agg(count(lit(1)).as("c"))
        .agg(expr(s"percentile(CAST(x AS DOUBLE), array($ps), c)").as("bs"))
    }
    time("eh: second pass only (fixed bounds)") {
      val bounds = spark.range(1).select(expr(
        "array(1.0D,2.0D,3.0D,4.0D,5.0D,6.0D,7.0D,8.0D,9.0D)").as("bs"))
      li.select(col("l_extendedprice").as("x"))
        .crossJoin(broadcast(bounds))
        .select(col("x"),
          (expr("size(filter(bs, b -> x > b))") + 1).cast(LongType).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min(col("x")), 2).as("lo"), round(max(col("x")), 2).as("hi"))
        .orderBy("bucket")
    }
    time("eh: full current") {
      graft.operators.Relational.equiDepthHistogram(spark, sfDir)
    }

    // --- q_mad breakdown ---
    time("md: grouped median only") {
      li.select(col("l_returnflag"), col("l_extendedprice").as("x"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(CAST(x AS DOUBLE), 0.5)").as("med"))
    }
    time("md: full current") {
      graft.operators.Relational.madOutliers(spark, sfDir)
    }

    // --- q_col_profile breakdown ---
    val orders = Tables.orders(spark, sfDir)
    def nulls(c: String) =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    time("cp: current single agg (SortAgg)") {
      orders.agg(
        count(lit(1)).as("n_rows"),
        nulls("o_orderkey"), countDistinct(col("o_orderkey")).as("nd_1"),
        min(col("o_orderkey")).cast(StringType).as("mn_1"),
        max(col("o_orderkey")).cast(StringType).as("mx_1"),
        nulls("o_custkey"), countDistinct(col("o_custkey")).as("nd_2"),
        min(col("o_custkey")).cast(StringType).as("mn_2"),
        max(col("o_custkey")).cast(StringType).as("mx_2"),
        nulls("o_orderstatus"), countDistinct(col("o_orderstatus")).as("nd_3"),
        min(col("o_orderstatus")).as("mn_3"),
        max(col("o_orderstatus")).as("mx_3"),
        nulls("o_totalprice"), countDistinct(col("o_totalprice")).as("nd_4"),
        min(col("o_totalprice")).as("mn_4"),
        max(col("o_totalprice")).as("mx_4"),
        nulls("o_orderdate"), countDistinct(col("o_orderdate")).as("nd_5"),
        min(col("o_orderdate")).as("mn_5"),
        max(col("o_orderdate")).as("mx_5"),
        nulls("o_orderpriority"), countDistinct(col("o_orderpriority")).as("nd_6"),
        min(col("o_orderpriority")).as("mn_6"),
        max(col("o_orderpriority")).as("mx_6"))
    }
    time("cp: distincts-only agg") {
      orders.agg(
        countDistinct(col("o_orderkey")).as("nd_1"),
        countDistinct(col("o_custkey")).as("nd_2"),
        countDistinct(col("o_orderstatus")).as("nd_3"),
        countDistinct(col("o_totalprice")).as("nd_4"),
        countDistinct(col("o_orderdate")).as("nd_5"),
        countDistinct(col("o_orderpriority")).as("nd_6"))
    }
    time("cp: minmax/null-only agg") {
      orders.agg(
        count(lit(1)).as("n_rows"),
        nulls("o_orderkey"),
        min(col("o_orderkey")).cast(StringType).as("mn_1"),
        max(col("o_orderkey")).cast(StringType).as("mx_1"),
        nulls("o_custkey"),
        min(col("o_custkey")).cast(StringType).as("mn_2"),
        max(col("o_custkey")).cast(StringType).as("mx_2"),
        nulls("o_orderstatus"),
        min(col("o_orderstatus")).as("mn_3"),
        max(col("o_orderstatus")).as("mx_3"),
        nulls("o_totalprice"),
        min(col("o_totalprice")).as("mn_4"),
        max(col("o_totalprice")).as("mx_4"),
        nulls("o_orderdate"),
        min(col("o_orderdate")).as("mn_5"),
        max(col("o_orderdate")).as("mx_5"),
        nulls("o_orderpriority"),
        min(col("o_orderpriority")).as("mn_6"),
        max(col("o_orderpriority")).as("mx_6"))
    }
    time("cp: split then crossJoin") {
      val d = orders.agg(
        countDistinct(col("o_orderkey")).as("nd_1"),
        countDistinct(col("o_custkey")).as("nd_2"),
        countDistinct(col("o_orderstatus")).as("nd_3"),
        countDistinct(col("o_totalprice")).as("nd_4"),
        countDistinct(col("o_orderdate")).as("nd_5"),
        countDistinct(col("o_orderpriority")).as("nd_6"))
      val m = orders.agg(
        count(lit(1)).as("n_rows"),
        nulls("o_orderkey"),
        min(col("o_orderkey")).cast(StringType).as("mn_1"),
        max(col("o_orderkey")).cast(StringType).as("mx_1"),
        nulls("o_custkey"),
        min(col("o_custkey")).cast(StringType).as("mn_2"),
        max(col("o_custkey")).cast(StringType).as("mx_2"),
        nulls("o_orderstatus"),
        min(col("o_orderstatus")).as("mn_3"),
        max(col("o_orderstatus")).as("mx_3"),
        nulls("o_totalprice"),
        min(col("o_totalprice")).as("mn_4"),
        max(col("o_totalprice")).as("mx_4"),
        nulls("o_orderdate"),
        min(col("o_orderdate")).as("mn_5"),
        max(col("o_orderdate")).as("mx_5"),
        nulls("o_orderpriority"),
        min(col("o_orderpriority")).as("mn_6"),
        max(col("o_orderpriority")).as("mx_6"))
      m.crossJoin(broadcast(d))
    }
    time("cp: full current") {
      graft.operators.DqChecks.colProfile(spark, sfDir)
    }

    // --- q_triangles / q_copurchase: current ---
    time("tr: full current", warm = 1, reps = 3) {
      graft.operators.Graph.triangles(spark, sfDir)
    }
    time("op: full current", warm = 1, reps = 3) {
      graft.operators.Basket.coPurchase(spark, sfDir)
    }
    spark.stop()
  }
}
