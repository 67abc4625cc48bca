package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the scale-critical queries so
  * join strategy / pushdown / codegen spans can be audited per round.
  * Usage: sbt "runMain graft.PlanAudit <sfDir> [query ...]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val which = if (args.length > 1) args.tail.toSet else Set(
      "q_pivot_ratio", "q_group_mean_having", "q_agg_sum", "q_left_join",
      "q_select_rename", "q_geo_join", "q_minhash_neardup", "q_ann_topk",
      "q_window_tumbling", "q_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => which(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
