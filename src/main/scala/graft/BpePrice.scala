package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: measure the BPE merge-loop trainer's scale shape
  * (operators.Bpe.train — r16's wire-free capability) instead of
  * asserting it. The claim under test: the corpus is touched ONCE (the
  * word-count pass) and each of the k merge rounds shuffles only the
  * vocab-bounded word table's pair partials — so total shuffle grows
  * with DISTINCT words, not corpus bytes, and rounds cost roughly the
  * same at every SF once vocab saturates. Prints per-SF rows (cold +
  * warm wall-clock, shuffle bytes/records, spill) for docs/SCALE.md.
  * Usage: sbt "runMain graft.BpePrice <sfDir> [rounds] [repeat]" */
object BpePrice {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpePrice <sfDir> [rounds] [repeat]")
    val sf = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 8
    val repeat = if (args.length > 2) args(2).toInt else 5
    val spark = Tables.localSession("bpeprice", 32)
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(): Unit = {
      val merges = graft.operators.Bpe.train(spark, sf, rounds)
      require(merges.nonEmpty, "trainer returned no merges")
      // round tables are vocab-bounded localCheckpoints; reap them so a
      // warm run isn't billed for the previous run's storage
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val lst = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (s.stageInfo.attemptNumber() == 0) {
          bytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
          spill.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
        }
    }
    spark.sparkContext.addSparkListener(lst)
    val t0 = System.nanoTime(); run(); val first = (System.nanoTime() - t0) / 1e9
    ShuffleBytes.drainListenerBus(bytes, recs, spill)
    spark.sparkContext.removeSparkListener(lst)
    val warm = (2 to repeat).map { _ =>
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
    }.sorted
    val med =
      if (warm.isEmpty) first
      else if (warm.length % 2 == 1) warm(warm.length / 2)
      else (warm(warm.length / 2 - 1) + warm(warm.length / 2)) / 2.0
    println(f"## bpe_train rounds=$rounds cold=$first%.2fs " +
      f"warm_median=$med%.2fs shuffle_bytes=${bytes.get} " +
      s"shuffle_records=${recs.get} disk_spill=${spill.get}")
    spark.stop()
  }
}
