package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("redact: planted PII is counted and scrubbed; clean docs untouched") {
    val out = SparkEntry.queries("q_redact")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val fpClean = graft.operators.TextAnalysis.fingerprint(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (e, p, ip, fp)) =>
      assert(e === (if (id % 11 == 0) 1L else 0L), s"doc $id email")
      assert(p === (if (id % 13 == 0) 1L else 0L), s"doc $id phone")
      assert(ip === (if (id % 17 == 0) 1L else 0L), s"doc $id ip")
      // a doc with no planted PII is byte-identical to the raw corpus
      // (same rolling fingerprint); a redacted doc is not
      if (id % 11 != 0 && id % 13 != 0 && id % 17 != 0)
        assert(fp === fpClean(id), s"doc $id unchanged")
      else assert(fp !== fpClean(id), s"doc $id must differ after redaction")
    }
  }

  test("redact leaves no matchable PII behind") {
    import spark.implicits._
    // re-scan the REDACTED text with the same patterns: zero hits
    val red = Curation.piiCorpus(spark, sf)
      .withColumn("rtext", regexp_replace(regexp_replace(regexp_replace(
        col("text"), Curation.EmailRe, "<EMAIL>"),
        Curation.PhoneRe, "<PHONE>"), Curation.IpRe, "<IP>"))
    val leftover = red.select(
      sum(size(regexp_extract_all(col("rtext"), lit(Curation.EmailRe),
        lit(0)))).as("e"),
      sum(size(regexp_extract_all(col("rtext"), lit(Curation.PhoneRe),
        lit(0)))).as("p"))
      .collect()(0)
    assert(leftover.getLong(0) === 0L && leftover.getLong(1) === 0L)
  }

  test("mixture sampling is deterministic and tracks the permille rates") {
    val a = SparkEntry.queries("q_sample_mix")(spark, sf).collect()
    val b = SparkEntry.queries("q_sample_mix")(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "same inputs must sample identically")
    val rates = Curation.mixRatesPermille.toMap
    a.foreach { r =>
      val (lang, n, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = rates.getOrElse(lang, Curation.mixDefaultPermille) / 1000.0
      assert(kept <= n)
      // LCG-uniform keep decision: observed rate within ±4σ of binomial
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= 4 * sigma + 1,
        s"$lang: kept $kept of $n at rate $rate")
    }
  }

  test("sequence packing: contiguous doc ranges, lossless totals, full bins") {
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    val totalTokens = docs
      .agg(sum(size(split(col("text"), "\\s+")).cast("long")))
      .collect()(0).getLong(0)
    val budget = 512L
    val bins = Curation.seqPack(spark, sf, budgetTokens = budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(bins.map(_._2).sum === totalDocs, "every doc lands in one bin")
    assert(bins.map(_._3).sum === totalTokens, "token volume preserved")
    // bins are contiguous, disjoint doc ranges in order
    bins.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB, "bins must partition the doc order")
      case _ => ()
    }
    // concat-and-chunk: every bin's token span covers its windows — a
    // bin's exclusive prefix start is < (bin+1)·budget and its docs start
    // before the boundary, so every bin except possibly the last holds at
    // least one full budget's worth of starts; cheap sanity: no empty bins
    assert(bins.forall(_._2 >= 1))
    assert(bins.map(_._1).toSeq === bins.map(_._1).toSeq.sorted)
  }

  test("learned-token packing matches a driver-side prefix-sum brute force") {
    import graft.operators.Bpe
    val merges = Bpe.train(spark, sf, 6)
    val budget = 256L
    // independent oracle: per-doc learned-token counts from the
    // reference encoder, exclusive prefix sum, first-token bin, manifest
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    var prefix = 0L
    val assigned = raw.map { case (id, text) =>
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(w => Bpe.encode(w, merges).length.toLong).sum
      val bin = prefix / budget
      prefix += t
      (bin, id, t)
    }
    val expect = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, ds) => (bin, ds.length.toLong, ds.map(_._3).sum,
        ds.map(_._2).min, ds.map(_._2).max)
    }
    val got = Curation.seqPackLearned(spark, sf, merges, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expect)
    // the learned measure must differ from the whitespace proxy — if the
    // two manifests coincide, the test is vacuous (6 merges leave most
    // words multi-token, so bpe_tokens >> ws tokens here)
    val ws = Curation.seqPack(spark, sf, budgetTokens = budget).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.map(_._3).sum > ws.values.sum,
      "learned-token volume should exceed the whitespace count at " +
        "shallow merge depth")
  }

  test("sequence packing is layout-stable: same bins at any parallelism") {
    // the two-pass prefix sum must not depend on how the range sort
    // partitions the data — the precondition for verifying a
    // 1000-executor packing run against a laptop run
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Curation.seqPack(spark, sf, budgetTokens = 512L).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    assert(run("2") === run("9"))
  }

  test("shard manifest: covering, balanced-ish, layout-stable") {
    val rows = Curation.shardManifest(spark, sf).collect()
    // every shard occupied, ids partition the corpus exactly
    assert(rows.length === Curation.DefaultShards)
    val total = rows.map(_.getLong(1)).sum
    assert(total === graft.Tables.documents(spark, sf).count())
    // LCG spray: no shard grossly over/under-loaded (key-derived, so this
    // is a property of the hash, not of partitioning luck)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max < 4 * sizes.min, sizes.mkString(","))
    // layout stability: the shard decision and the xor checksum must not
    // depend on parallelism — the laptop-verifies-the-cluster precondition
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Curation.shardManifest(spark, sf).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    assert(run("2") === run("7"))
  }

  test("shard manifest describes a REAL partitioned write exactly") {
    // the manifest is only honest if an actual partitionBy(shard) write
    // produces directories whose contents re-aggregate to the same rows:
    // write the sharded corpus, read it back, recompute the manifest from
    // the files on disk, compare cell-for-cell
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val assigned = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        (pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L + 7L,
          lit(1000003L)) % Curation.DefaultShards).as("shard"))
    assigned.write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
      .select(col("shard").cast(LongType).as("shard"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"),
        expr("rolling_fp(text)").as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr("bit_xor(fp)").as("fp_xor"))
      .orderBy("shard")
    assert(back.collect().toSeq ===
      Curation.shardManifest(spark, sf).collect().toSeq)
    // and the on-disk layout really is one directory per shard
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length === Curation.DefaultShards, dirs.mkString(","))
  }

  test("curate chain: every stage's contract visible in the survivors") {
    val out = SparkEntry.queries("q_curate_chain")(spark, sf).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // stage 3 (exact dedup keep-first): a planted +1M copy can never
    // survive — its original has the smaller id and identical metrics, so
    // both reach the dedup together and min() keeps the original
    assert(ids.forall(_ < 1000000), ids.filter(_ >= 1000000).take(5).toString)
    // stage 2 (repetition): every survivor is under the threshold
    out.foreach(r => assert(
      r.getDouble(2) <= graft.operators.TextAnalysis.RepetitionThreshold))
    // stage 4 (decontam): any natural doc q_decontam flags as contaminated
    // must be absent here (whether it fell at an earlier stage or at
    // decontam itself, it may not survive)
    val contaminated = SparkEntry.queries("q_decontam")(spark, sf).collect()
      .filter(r => r.getLong(0) < 1000000 && r.getBoolean(4))
      .map(_.getLong(0))
    assert(contaminated.nonEmpty, "decontam gate exercised by no doc")
    contaminated.foreach(c => assert(!ids(c), s"contaminated $c survived"))
    // stage 5 (redaction): the planted PII rule shows in the counts
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) === (if (id % 11 == 0) 1L else 0L), s"email $id")
      assert(r.getLong(4) === (if (id % 13 == 0) 1L else 0L), s"phone $id")
      assert(r.getLong(5) === (if (id % 17 == 0) 1L else 0L), s"ip $id")
    }
    // stage 1 (language): deterministic — rerunning yields the same set
    val again = SparkEntry.queries("q_curate_chain")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("domain cap: every source capped at k; two-stage == single window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val out = graft.operators.Curation.domainCap(spark, sf, k = 20).collect()
    val perSource = out.groupBy(_.getString(0)).view.mapValues(_.length)
    // every source holds 25 docs at this SF — the cap binds everywhere
    assert(perSource.values.forall(_ === 20), perSource.toMap)
    assert(perSource.keys.size === 20)
    // ranks are 1..k with no gaps
    out.groupBy(_.getString(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to 20L))
    }
    // the skew-proof two-stage selection returns EXACTLY the naive
    // single-window result (the executable spec it optimizes)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L + 13L,
          lit(1000003L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy("h", "doc_id")))
      .filter(col("rank") <= 20)
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet === naive)
  }

  test("weighted sample: exact top-k recount; weight bias is real") {
    val out = SparkEntry.queries("q_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent integer recount of every priority
    val pri = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val h = ((id % 1000003L) * 2654435761L + 29L) % 1000003L
        (id, w, w * Curation.PriScale / (h + 1))
      }
    val expect = pri.sortBy(p => (-p._3, p._1))
      .take(Curation.WeightedSampleK).zipWithIndex
      .map { case ((id, w, p), i) => ((i + 1).toLong, id, w, p) }
    assert(out.toSeq === expect.toSeq)
    // inclusion is weight-biased: sampled docs are longer than average
    val sampleMean = out.map(_._3).sum.toDouble / out.length
    val corpusMean = pri.map(_._2).sum.toDouble / pri.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("chunk windows: count, widths, and coverage match the closed form") {
    import graft.operators.Curation.{ChunkStride, ChunkWin}
    val out = SparkEntry.queries("q_chunk_windows")(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === toks.keySet) // every document chunked
    byDoc.foreach { case (id, chunks) =>
      val n = toks(id)
      val expected =
        if (n <= ChunkWin) 1 else (n - ChunkWin + ChunkStride - 1) / ChunkStride + 1
      assert(chunks.length === expected, s"doc $id: n=$n")
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ===
        (0L until expected.toLong))
      // all chunks full-width except possibly the last, and the strided
      // windows exactly cover the token sequence
      sorted.init.foreach(c => assert(c.getAs[Long]("n_tok") === ChunkWin))
      val last = sorted.last.getAs[Long]("n_tok")
      assert(last >= 1 && last <= ChunkWin)
      assert((expected - 1).toLong * ChunkStride + last === n,
        s"doc $id: n=$n coverage gap")
    }
  }

  test("stratified sample: brute-force recount; fallback branch exercised") {
    import graft.operators.Curation
    val k = Curation.StratifiedK
    val out = SparkEntry.queries("q_stratified")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force ground truth computed in memory over the raw table
    val m = 1000003L
    val all = Tables.documents(spark, sf).select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .map { case (l, id) => (l, id, ((id % m) * 2654435761L + 13L) % m) }
    val expect = all.groupBy(_._1).toSeq.flatMap { case (l, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(k).zipWithIndex
        .map { case ((_, id, h), i) => (l, i + 1L, id, h) }
    }.toSet
    assert(out.toSet === expect)
    // exact allocation: min(k, stratum size) rows per stratum
    val sizes = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    out.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.length.toLong === math.min(k.toLong, sizes(l)), s"stratum $l")
    }
    // the planted tight threshold must actually force zh down the
    // fallback path (survivor count below k), while a regular stratum
    // certifies — both branches data-exercised
    def survivors(l: String, tight: Boolean): Long = {
      val n = sizes(l)
      val t = if (tight) (8L * k * m) / (n * 32L) else (8L * k * m) / n
      all.count(r => r._1 == l && r._3 < t).toLong
    }
    assert(survivors("zh", tight = true) < k, "zh fallback not exercised")
    assert(survivors("en", tight = false) >= k, "en did not certify")
  }
}
