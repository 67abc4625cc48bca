package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: total shuffle WRITE volume (bytes + records) for named catalog
  * queries — the direct evidence behind "this replan changes what the
  * corpus-wide shuffle CARRIES", which small-SF wall-clock cannot see (at
  * sf0.1 both span-dedup plans shuffle megabytes; at 100 TB the difference
  * is petabytes vs terabytes). Sums every stage's shuffleWriteMetrics over
  * one noop-sink execution per query.
  * Usage: sbt "runMain graft.ShuffleBytes <sfDir> <query> [query...]" */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleBytes <sfDir> <query...>")
    val sf = args(0)
    val spark = Tables.localSession("shufflebytes", 32)
    spark.range(1000).selectExpr("sum(id)").collect() // session warm-up
    for (q <- args.drop(1)) {
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val recs = new java.util.concurrent.atomic.AtomicLong
      val spill = new java.util.concurrent.atomic.AtomicLong
      val lst = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          // Retried stage attempts would double-count the attempt-0 writes;
          // in local mode attempt 0 is the only one that runs to completion.
          if (s.stageInfo.attemptNumber() == 0) {
            bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
            recs.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
            spill.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
          }
        }
      }
      spark.sparkContext.addSparkListener(lst)
      SparkEntry.queries(q)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      // The listener bus drains asynchronously; a fixed sleep under-counts on
      // a slow window. Poll until two consecutive reads (250 ms apart) agree,
      // bounded at 15 s — by then the post-action event queue is long gone.
      var prev = (-1L, -1L, -1L)
      var waited = 0L
      while (prev != ((bytes.get, recs.get, spill.get)) && waited < 15000) {
        prev = (bytes.get, recs.get, spill.get)
        Thread.sleep(250)
        waited += 250
      }
      spark.sparkContext.removeSparkListener(lst)
      println(s"## $q shuffle_bytes=${bytes.get} shuffle_records=${recs.get}" +
        s" disk_spill=${spill.get}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
