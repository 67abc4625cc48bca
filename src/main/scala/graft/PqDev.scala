package graft


/** Dev tool: measure the PQ ANN path — recall@10 vs brute force across
  * the (subspaces, rerank) knob grid, and the shuffle-volume contrast
  * vs [[graft.operators.Similarity.bruteForceTopK]] (the compression
  * claim: the pair-scoring stage ships codes + one double per corpus
  * row instead of dim floats). Warm wall-clock = median of runs 2–N,
  * shuffle from run 1 (plan-invariant).
  * Usage: sbt "runMain graft.PqDev <sfDir> [repeat]" */
object PqDev {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqDev <sfDir> [repeat]")
    val sf = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = Tables.localSession("pqdev", 32)
    import graft.operators.Similarity
    val bf = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(bf).size.toDouble / bf.size
    }
    for (sub <- Seq(8, 16); rr <- Seq(0, 40, 100)) {
      val r = recall(Similarity.pqTopK(spark, sf, rerank = rr,
        subspaces = sub))
      println(f"## pq sf=$sf sub=$sub rerank=$rr recall=$r%.3f")
    }
    for (rr <- Seq(40, 100)) {
      val r = recall(Similarity.ivfPqTopK(spark, sf, rerank = rr))
      println(f"## ivfpq sf=$sf rerank=$rr recall=$r%.3f")
    }
    val rIvf = recall(Similarity.ivfTopK(spark, sf))
    println(f"## ivf sf=$sf recall=$rIvf%.3f")
    // OPQ beside PQ (r17): the isotropic corpus is the honest control
    // (nothing to rebalance), the anisotropic plant is the case the
    // rotation exists for — pure-ADC ranks, the sharpest contrast
    for (rr <- Seq(0, 100)) {
      val r = recall(Similarity.opqTopK(spark, sf, rerank = rr))
      println(f"## opq sf=$sf rerank=$rr recall=$r%.3f")
    }
    val plant = Tables.embeddings(spark, sf).withColumn("embedding",
      org.apache.spark.sql.functions.expr(
        """transform(embedding, (v, i) ->
          |  CAST(v AS DOUBLE) *
          |  (CASE WHEN i < 4 THEN 100.0D ELSE 0.01D END))"""
          .stripMargin))
    val bfPlant = Similarity.bruteForceTopKOf(plant)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallPlant(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(bfPlant).size.toDouble / bfPlant.size
    }
    val pqP = recallPlant(Similarity.pqTopKOf(plant, rerank = 0))
    val opqP = recallPlant(Similarity.opqTopKOf(plant, rerank = 0))
    println(f"## opq_plant sf=$sf pq_adc=$pqP%.3f opq_adc=$opqP%.3f")
    // the full composition: OPQ pretransform × IVF pruning × residual
    // PQ × bounded rerank (rotation preserves cosine, so raw-space
    // brute force is the right truth)
    val rOpqIvf = recall(Similarity.ivfPqSearch(spark, sf,
      Similarity.ivfPqBuild(spark, sf, rotate = true)))
    println(f"## opq_ivfpq sf=$sf rerank=100 recall=$rOpqIvf%.3f")
    // shuffle + warm wall-clock, PQ defaults vs brute force (shared
    // listener + median helpers; cold clock stops before the drain)
    def measure(tag: String)(mk: () => org.apache.spark.sql.DataFrame)
        : Unit = {
      def run(): Unit = {
        require(mk().count() > 0L)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
      var cold = 0.0
      val tot = ShuffleBytes.measureStages(spark) {
        val t0 = System.nanoTime(); run()
        cold = (System.nanoTime() - t0) / 1e9
      }
      val warm = (2 to repeat).map { _ =>
        val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
      }
      val med = ShuffleBytes.warmMedian(cold, warm)
      println(f"## pq_cost $tag cold=$cold%.2fs warm_median=$med%.2fs " +
        f"shuffle_bytes=${tot.bytes} shuffle_records=${tot.records} " +
        s"disk_spill=${tot.spill}")
    }
    measure("brute_force")(() => Similarity.bruteForceTopK(spark, sf))
    measure("pq_default")(() => Similarity.pqTopK(spark, sf))
    // persisted-index split (r17): build ONCE vs search MANY — the
    // whole point of the split is that the search rows exclude every
    // training/encode cost the build rows carry
    val idxDir = java.nio.file.Files.createTempDirectory("pqidx").toString
    try {
      def buildRun(): Unit = {
        Similarity.pqIndexBuild(spark, sf, idxDir)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
      var coldB = 0.0
      val totB = ShuffleBytes.measureStages(spark) {
        val t0 = System.nanoTime(); buildRun()
        coldB = (System.nanoTime() - t0) / 1e9
      }
      val warmB = (2 to repeat).map { _ =>
        val t = System.nanoTime(); buildRun()
        (System.nanoTime() - t) / 1e9
      }
      println(f"## pq_cost index_build cold=$coldB%.2fs " +
        f"warm_median=${ShuffleBytes.warmMedian(coldB, warmB)}%.2fs " +
        f"shuffle_bytes=${totB.bytes} shuffle_records=${totB.records} " +
        s"disk_spill=${totB.spill}")
      measure("index_search")(() => Similarity.pqIndexSearch(spark, sf, idxDir))
      measure("ivfpq_inmem")(() => Similarity.ivfPqTopK(spark, sf))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(idxDir))
    }
    spark.stop()
  }
}
