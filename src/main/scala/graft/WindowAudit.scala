package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import scala.util.control.NonFatal

/** Dev tool (r20): inventory every WindowExec with NO partition spec
  * across ALL declared queries — the "Moving all data to a single
  * partition" warning class. An unpartitioned window funnels its entire
  * input through one task, which at 100 TB is a driver-killer unless the
  * frame is bounded by construction (a post-aggregate or top-k frame of
  * at most a few thousand rows). This prints, per query, each
  * unpartitioned window with its window expressions and the plan subtree
  * rows flowing in, so each hit can be classified bounded vs scan-sized.
  * AQE is disabled for the audit session so the physical tree is directly
  * collectible (plan SHAPE, not timing, is what is read here).
  * Usage: sbt "runMain graft.WindowAudit <sfDir> [query ...]" */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val which: Set[String] =
      if (args.length > 1) args.tail.toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var total = 0
    SparkEntry.queries
      .filter(q => which.isEmpty || which(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          val hits = collectUnpartitioned(plan)
          if (hits.nonEmpty) {
            println(s"\n========== $name: ${hits.size} unpartitioned window(s)")
            hits.foreach { w =>
              total += 1
              val exprs = w.windowExpression.map(_.sql).mkString("; ")
              println(s"  exprs: ${exprs.take(200)}")
              println(s"  child: ${w.child.getClass.getSimpleName} | " +
                w.child.simpleStringWithNodeId().take(160))
            }
          }
        } catch { case NonFatal(e) =>
          println(s"\n========== $name: AUDIT FAILED ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    println(s"\n[window-audit] total unpartitioned WindowExec nodes: $total")
    spark.stop()
  }

  /** WindowExec nodes with an empty partitionSpec, searched through the
    * whole tree including subqueries. */
  def collectUnpartitioned(plan: SparkPlan): Seq[WindowExec] =
    plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
}
