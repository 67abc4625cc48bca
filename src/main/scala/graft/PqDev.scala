package graft


/** Dev tool: measure the PQ ANN path — recall@10 vs brute force across
  * the (subspaces, rerank) knob grid, and the shuffle-volume contrast
  * vs [[graft.operators.Similarity.bruteForceTopK]] (the compression
  * claim: the pair-scoring stage ships codes + one double per corpus
  * row instead of dim floats). Warm wall-clock = median of runs 2–N,
  * shuffle from run 1 (plan-invariant).
  * Usage: sbt "runMain graft.PqDev <sfDir> [repeat]" */
object PqDev {

  private def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** recall@k against a fixed ground-truth pair set — instantiate once
    * per truth (corpus brute force, plant brute force, …). */
  private def recallVs(truth: Set[(Long, Long)])
                      (df: org.apache.spark.sql.DataFrame): Double =
    topSet(df).intersect(truth).size.toDouble / truth.size

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqDev <sfDir> [repeat]")
    val sf = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = Tables.localSession("pqdev", 32)
    import graft.operators.Similarity

    // shuffle + warm wall-clock around ANY action (shared listener +
    // median helpers; cold clock stops before the drain) — the ONE cost
    // block every row below goes through
    def measureRun(tag: String)(body: () => Unit): Unit = {
      def run(): Unit = {
        body()
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
    def measure(tag: String)(mk: () => org.apache.spark.sql.DataFrame)
        : Unit =
      measureRun(tag)(() => require(mk().count() > 0L))

    val recall = recallVs(topSet(Similarity.bruteForceTopK(spark, sf)))(_)
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
    val recallPlant = recallVs(topSet(Similarity.bruteForceTopKOf(plant)))(_)
    val pqP = recallPlant(Similarity.pqTopKOf(plant, rerank = 0))
    val opqP = recallPlant(Similarity.opqTopKOf(plant, rerank = 0))
    println(f"## opq_plant sf=$sf pq_adc=$pqP%.3f opq_adc=$opqP%.3f")
    // non-parametric OPQ (r18): alternating encode ↔ Procrustes from the
    // parametric init — the SCALE.md verdict row: does the refinement
    // buy recall over the parametric rotation at the same budget?
    val plantDim = Similarity.dimOf(plant)
    val plantSamp = Similarity.ivfTrainingSample(plant,
      Similarity.pqSampleK(1 << Similarity.PqBits))
    val (npRot, npTrace) =
      Similarity.opqRotationNPTrace(plantSamp, plantDim)
    val npP = recallPlant(Similarity.pqTopKOf(
      Similarity.opqRotate(plant, npRot), rerank = 0))
    println(f"## npopq_plant sf=$sf adc=$npP%.3f mse_trace=" +
      npTrace.map(t => f"$t%.5f").mkString(","))
    val baseIso = Tables.embeddings(spark, sf)
    val isoSamp = Similarity.ivfTrainingSample(baseIso,
      Similarity.pqSampleK(1 << Similarity.PqBits))
    val (npRotI, npTraceI) = Similarity.opqRotationNPTrace(
      isoSamp, Similarity.dimOf(baseIso))
    val npI = recall(Similarity.pqTopKOf(
      Similarity.opqRotate(baseIso, npRotI), rerank = 0))
    println(f"## npopq_iso sf=$sf adc=$npI%.3f mse_trace=" +
      npTraceI.map(t => f"$t%.5f").mkString(","))
    // SQ8 beside PQ (r18): the second compression family — 4× storage
    // with per-dimension fidelity vs PQ's 64× with subspace codebooks
    for (rr <- Seq(0, 40, 100)) {
      val r = recall(Similarity.sq8TopK(spark, sf, rerank = rr))
      println(f"## sq8 sf=$sf rerank=$rr recall=$r%.3f")
    }
    // IVF × SQ8 (r18): equal pruning to ivfpq, SQ8 residuals instead
    // of PQ codes — what 16× more code bytes buy back in recall
    for (rr <- Seq(40, 100)) {
      val r = recall(Similarity.ivfSq8TopK(spark, sf, rerank = rr))
      println(f"## ivfsq8 sf=$sf rerank=$rr recall=$r%.3f")
    }
    // the full composition: OPQ pretransform × IVF pruning × residual
    // PQ × bounded rerank (rotation preserves cosine, so raw-space
    // brute force is the right truth)
    val rOpqIvf = recall(Similarity.ivfPqSearch(spark, sf,
      Similarity.ivfPqBuild(spark, sf, rotate = true)))
    println(f"## opq_ivfpq sf=$sf rerank=100 recall=$rOpqIvf%.3f")
    measure("brute_force")(() => Similarity.bruteForceTopK(spark, sf))
    measure("pq_default")(() => Similarity.pqTopK(spark, sf))
    measure("sq8_default")(() => Similarity.sq8TopK(spark, sf))
    measure("ivfsq8_default")(() => Similarity.ivfSq8TopK(spark, sf))
    // persisted-index split (r17): build ONCE vs search MANY — the
    // whole point of the split is that the search rows exclude every
    // training/encode cost the build rows carry
    val idxDir = java.nio.file.Files.createTempDirectory("pqidx").toString
    try {
      measureRun("index_build")(() => {
        Similarity.pqIndexBuild(spark, sf, idxDir); ()
      })
      measure("index_search")(() => Similarity.pqIndexSearch(spark, sf, idxDir))
      measure("ivfpq_inmem")(() => Similarity.ivfPqTopK(spark, sf))
      // drift-watchdog economics (r18): the retrain decision reads the
      // audit, so the audit must be priced AGAINST the rebuild it
      // decides about — same corpus, same index, the internal draw as
      // the query batch (a deployment hands in today's traffic)
      val baseDf = Tables.embeddings(spark, sf)
      val qBatch = baseDf.join(
        org.apache.spark.sql.functions.broadcast(
          Similarity.annQueryIds(baseDf)), "vec_id")
        .select("vec_id", "embedding")
      measure("recall_audit")(() =>
        Similarity.pqIndexRecallAudit(spark, baseDf, idxDir, qBatch))
      measure("index_stats")(() => Similarity.pqIndexStats(spark, idxDir))
      // the dup audit returns ZERO rows on a healthy index — that IS
      // the expected result, so force the scan without a row floor
      measureRun("dup_audit")(() => {
        Similarity.pqIndexDupIds(spark, idxDir).count(); ()
      })
      // r19: the decision records priced beside the gauge they read —
      // the log append re-runs the audit (its cost dominates); both
      // advice rows are metadata reads, so the per-window decision
      // loop costs ~one audit + ~nothing
      measureRun("audit_log")(() => {
        Similarity.pqIndexAuditLog(spark, baseDf, idxDir, qBatch); ()
      })
      measure("rebuild_advice")(() =>
        Similarity.indexRebuildAdvice(spark, idxDir))
      measure("compaction_advice")(() =>
        Similarity.indexCompactionAdvice(spark, idxDir))
    } finally rm(new java.io.File(idxDir))
    // r19: the persisted SQ8 split — build ONCE vs search MANY for the
    // family at the coarse probe ceiling (the serving family a
    // rerank-bandwidth-bound deployment picks; before r19 it retrained
    // per call, i.e. every search cost the build row below)
    val sqDir = java.nio.file.Files.createTempDirectory("sq8idx").toString
    try {
      measureRun("sq8_index_build")(() => {
        Similarity.sq8IndexBuild(spark, sf, sqDir); ()
      })
      measure("sq8_index_search")(() =>
        Similarity.sq8IndexSearch(spark, sf, sqDir))
      val baseDf = Tables.embeddings(spark, sf)
      val qBatch = baseDf.join(
        org.apache.spark.sql.functions.broadcast(
          Similarity.annQueryIds(baseDf)), "vec_id")
        .select("vec_id", "embedding")
      measure("sq8_recall_audit")(() =>
        Similarity.sq8IndexRecallAudit(spark, baseDf, sqDir, qBatch))
    } finally rm(new java.io.File(sqDir))
    // r19: NP-OPQ END-TO-END — the rotateNP-in-pqIndexBuild decision
    // (r18 verdict #4): the pure-ADC isotropic lift set the bar; the
    // rotation ships in the persisted build ONLY if it beats the
    // parametric rotation at equal SERVING budget (derived probes,
    // bounded rerank) end to end. The rotation is orthogonal (cosines
    // preserved), so an index built over a pre-rotated corpus copy
    // serves the same queries — recall measured against the RAW
    // corpus's brute-force truth either way, and the same build/search
    // code path runs for both rotations (only the matrix differs).
    // one rotated-corpus write + ONE index build per rotation; only the
    // search's rerank knob varies across the sweep (the build artifacts
    // are rerank-independent — rebuilding per (rotation, rerank) pair
    // would triple the bench wall-clock for identical numbers)
    def endToEnd(rot: Array[Array[Double]],
                 rrs: Seq[Int]): Map[Int, Double] = {
      val tmp = java.nio.file.Files.createTempDirectory("npe2e").toString
      try {
        Similarity.opqRotate(Tables.embeddings(spark, sf), rot)
          .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
        val idx = Similarity.ivfPqBuild(spark, tmp)
        rrs.map(rr => rr ->
          recall(Similarity.ivfPqSearch(spark, tmp, idx, rerank = rr)))
          .toMap
      } finally rm(new java.io.File(tmp))
    }
    val rotPara = Similarity.opqRotation(isoSamp,
      Similarity.dimOf(baseIso))
    // r19 late: does a rotation buy the SQ8 family anything? The
    // expected answer is NO — SQ8 quantizes every dimension at 8 bits,
    // so there is no subspace-allocation problem for a rotation to
    // fix (the thing OPQ exists for in PQ's 4-bit-per-subspace
    // regime) — but the honest verdict is a measured row, not an
    // argument. Pure ADC (rerank 0), same raw-corpus truth (the
    // rotation preserves cosines).
    val sq8Raw = recall(Similarity.sq8TopKOf(baseIso, rerank = 0))
    val sq8RotP = recall(Similarity.sq8TopKOf(
      Similarity.opqRotate(baseIso, rotPara), rerank = 0))
    val sq8RotNp = recall(Similarity.sq8TopKOf(
      Similarity.opqRotate(baseIso, npRotI), rerank = 0))
    println(f"## sq8_rotation sf=$sf raw=$sq8Raw%.3f " +
      f"para=$sq8RotP%.3f np=$sq8RotNp%.3f")
    val rrs = Seq(Similarity.K, 40, 100)
    val e2ePara = endToEnd(rotPara, rrs)
    val e2eNp = endToEnd(npRotI, rrs)
    for (rr <- rrs)
      println(f"## npopq_e2e sf=$sf rerank=$rr para=${e2ePara(rr)}%.3f " +
        f"np=${e2eNp(rr)}%.3f")
    spark.stop()
  }
}
