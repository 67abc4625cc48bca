package graft

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
      // shuffle metrics from run 1 only (the plan's volume is run-
      // invariant); wall-clock from every run, warm = median of 2..N;
      // the cold clock stops BEFORE the listener-bus drain
      var first = 0.0
      val tot = ShuffleBytes.measureStages(spark) {
        val t0 = System.nanoTime(); run()
        first = (System.nanoTime() - t0) / 1e9
      }
      val warm = (2 to repeat).map { _ =>
        val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
      }
      val med = ShuffleBytes.warmMedian(first, warm)
      println(f"## $name cold=$first%.2fs warm_median=$med%.2fs " +
        s"shuffle_bytes=${tot.bytes} shuffle_records=${tot.records} " +
        s"disk_spill=${tot.spill}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
