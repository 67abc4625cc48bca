package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: price the DISTRIBUTED IVF quantizer path
  * (Similarity.ivfTopKDistributed — the documented 100 TB form: MLlib
  * Lloyd rounds + centroids as a broadcast dimension table) against the
  * in-plan-literal quantizer the catalog query q_ann_ivf runs
  * (Similarity.ivfTopK — bit-replayable, centroids baked into the
  * expression tree). Reports warm wall-clock medians and one ShuffleBytes
  * row per form so docs/SCALE.md can quote the production recommendation
  * from a measurement, not plan prose (r14 verdict #5).
  * Usage: sbt "runMain graft.IvfPrice <sfDir> [repeat]" */
object IvfPrice {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfPrice <sfDir> [repeat]")
    val sf = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 5
    val spark = Tables.localSession("ivfprice", 32)
    spark.range(1000).selectExpr("sum(id)").collect()
    for ((name, run) <- Seq[(String, () => Unit)](
      "ivf_literal" -> (() => graft.operators.Similarity.ivfTopK(spark, sf)
        .write.mode("overwrite").format("noop").save()),
      "ivf_distributed" -> (() =>
        graft.operators.Similarity.ivfTopKDistributed(spark, sf)
          .write.mode("overwrite").format("noop").save()))) {
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
      // shuffle metrics from run 1 only (the plan's volume is run-
      // invariant); wall-clock from every run, warm = median of 2..N
      spark.sparkContext.addSparkListener(lst)
      val t0 = System.nanoTime(); run(); val first = (System.nanoTime() - t0) / 1e9
      ShuffleBytes.drainListenerBus(bytes, recs, spill)
      spark.sparkContext.removeSparkListener(lst)
      val warm = (2 to repeat).map { _ =>
        val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
      }.sorted
      // True median (r16, ADVICE low): repeat=5 leaves 4 warm runs, and
      // warm(len/2) on an even count is the UPPER middle — a slight
      // upward bias vs the "warm median of runs 2..N" the SCALE.md rows
      // quote. Even count → mean of the two middles; odd unchanged.
      val med =
        if (warm.isEmpty) first
        else if (warm.length % 2 == 1) warm(warm.length / 2)
        else (warm(warm.length / 2 - 1) + warm(warm.length / 2)) / 2.0
      println(f"## $name cold=$first%.2fs warm_median=$med%.2fs " +
        s"shuffle_bytes=${bytes.get} shuffle_records=${recs.get} " +
        s"disk_spill=${spill.get}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
