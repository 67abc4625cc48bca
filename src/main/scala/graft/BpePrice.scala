package graft


/** Dev tool: measure the BPE merge-loop trainer's scale shape
  * (operators.Bpe.train — r16's wire-free capability) instead of
  * asserting it. The claim under test: the corpus is touched ONCE (the
  * word-count pass) and each of the k merge rounds shuffles only the
  * vocab-bounded word table's pair partials — so total shuffle grows
  * with DISTINCT words, not corpus bytes, and rounds cost roughly the
  * same at every SF once vocab saturates. Prints per-SF rows (cold +
  * warm wall-clock, shuffle bytes/records, spill) for docs/SCALE.md.
  * Mode `doc` prices the doc-grain consumer instead (Bpe.docTokenCounts
  * on a pre-trained vocabulary): expected CORPUS-linear shuffle — the
  * (doc, word) aggregation and the word-keyed dictionary join scale
  * with data, unlike the trainer's vocab-bounded loop.
  * Mode `gpt2` prices the GPT-2-seam trainer (r18: Gpt2PreTok + byte
  * grain — the production byte-level shape) against mode `train`'s
  * (ws, char) baseline at the same rounds: the pre-tokenizer keeps
  * case and punctuation runs, so the distinct-pre-token table is
  * larger and the symbols are hex pairs — the honest cost of faithful
  * segmentation, still vocab-bounded per round.
  * Mode `ranked` prices the rank-priority consumer (r19:
  * Bpe.docTokenCountsRanked — tiktoken's runtime semantics) against
  * mode `doc`'s round-replay of the SAME (ws, char) vocabulary: the
  * ranked loop is data-dependent per distinct word (iterations = the
  * deepest merge chain, not k fixed folds) — the honest cost of the
  * imported-vocabulary semantics.
  * Mode `import` prices the ranked-token interchange round trip (r19:
  * Bpe.vocabRankedTokens → vocabFromRankedTokens + exact-recovery
  * check): pure vocab-bounded driver algebra, corpus untouched — the
  * expected row is ~0 s and zero shuffle at every SF, and printing it
  * is the point (corpus-size-independence is the claim).
  * Usage: sbt "runMain graft.BpePrice <sfDir> [rounds] [repeat] [mode]" */
object BpePrice {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: BpePrice <sfDir> [rounds] [repeat] " +
        "[train|doc|gpt2|ranked|import]")
    val sf = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 8
    val repeat = if (args.length > 2) args(2).toInt else 5
    val mode = if (args.length > 3) args(3) else "train"
    require(mode == "train" || mode == "doc" || mode == "gpt2" ||
        mode == "ranked" || mode == "import",
      s"unknown mode $mode")
    val spark = Tables.localSession("bpeprice", 32)
    spark.range(1000).selectExpr("sum(id)").collect()
    // doc mode replays a FIXED vocabulary (trained outside the timed
    // region — pricing the consumer, not the trainer)
    val docVocab: Seq[graft.operators.Bpe.Merge] =
      if (mode == "doc" || mode == "ranked" || mode == "import")
        graft.operators.Bpe.train(spark, sf, rounds)
      else Seq.empty
    def run(): Unit = {
      if (mode == "train") {
        val merges = graft.operators.Bpe.train(spark, sf, rounds)
        require(merges.nonEmpty, "trainer returned no merges")
      } else if (mode == "gpt2") {
        val vocab = graft.operators.Bpe.trainVocab(spark, sf, rounds,
          graft.operators.Bpe.ByteGrain, graft.operators.Bpe.Gpt2PreTok)
        require(vocab.merges.nonEmpty, "gpt2 trainer returned no merges")
      } else if (mode == "import") {
        // the r19 interchange round trip: export the trained table as
        // ranked tokens, reconstruct the implicit merge pairs, verify
        // exact recovery — pure driver work, vocab-bounded, corpus
        // untouched (the train above is outside the timed region)
        require(docVocab.nonEmpty, "trainer returned no merges to import")
        val v = graft.operators.Bpe.Vocab(docVocab,
          graft.operators.Bpe.CharGrain)
        val back = graft.operators.Bpe.vocabFromRankedTokens(
          graft.operators.Bpe.vocabRankedTokens(v),
          graft.operators.Bpe.CharGrain)
        require(back.merges.map(m => (m.left, m.right, m.merged)) ==
            v.merges.map(m => (m.left, m.right, m.merged)),
          "ranked-token round trip diverged")
      } else if (mode == "ranked") {
        val n = graft.operators.Bpe.docTokenCountsRanked(
            Tables.documents(spark, sf),
            graft.operators.Bpe.Vocab(docVocab,
              graft.operators.Bpe.CharGrain))
          .selectExpr("sum(bpe_tokens)").collect()(0).getLong(0)
        require(n > 0L, "ranked doc token counts returned nothing")
      } else {
        val n = graft.operators.Bpe.docTokenCounts(spark, sf, docVocab)
          .selectExpr("sum(bpe_tokens)").collect()(0).getLong(0)
        require(n > 0L, "doc token counts returned nothing")
      }
      // round tables are vocab-bounded localCheckpoints; reap them so a
      // warm run isn't billed for the previous run's storage
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // shuffle from run 1 (plan-invariant); cold clock stops before the
    // listener-bus drain; warm median via the shared even-count fold
    var first = 0.0
    val tot = ShuffleBytes.measureStages(spark) {
      val t0 = System.nanoTime(); run()
      first = (System.nanoTime() - t0) / 1e9
    }
    val warm = (2 to repeat).map { _ =>
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
    }
    val med = ShuffleBytes.warmMedian(first, warm)
    println(f"## bpe_$mode rounds=$rounds cold=$first%.2fs " +
      f"warm_median=$med%.2fs shuffle_bytes=${tot.bytes} " +
      s"shuffle_records=${tot.records} disk_spill=${tot.spill}")
    spark.stop()
  }
}
