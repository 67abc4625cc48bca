package graft

import graft.operators.{Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("lang-id: english docs (which carry 'the'/'a') classify as en") {
    val rows = SparkEntry.queries("q_lang_id")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val en = rows.collect { case (("en", p), n) => p -> n }
    val total = en.map(_._2).sum
    val asEn = en.toMap.getOrElse("en", 0L)
    assert(asEn.toDouble / total > 0.7, s"en accuracy ${asEn.toDouble / total}")
  }

  test("token_profile kernel == HOF aggregate spec (incl. non-ASCII/empty)") {
    import spark.implicits._
    val docs = Seq(
      "the cat and the hat", // en hits
      "der Ütest und die übung ist gut", // non-ASCII chars, de hits
      "", // empty → 1 empty token, 0 hits
      "  padded   text  ", // collapsing whitespace upstream
      "le la le la le") // repeated fr hits
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val langs = TextAnalysis.langProfiles.keys.toSeq.sorted
    val profLit = langs
      .map(l => TextAnalysis.langProfiles(l).map(w => s"'$w'")
        .mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val norm = "regexp_replace(lower(text), '\\\\s+', ' ')"
    val kernel = docs.selectExpr("doc_id", s"token_profile($norm, $profLit) AS tp")
    val hofCols = s"size(split($norm, ' ')) AS n" +: langs.zipWithIndex.map {
      case (l, i) =>
        val arr = TextAnalysis.langProfiles(l).map(w => s"'$w'").mkString(",")
        s"""aggregate(split($norm, ' '), 0L, (acc, t) ->
           |  acc + CASE WHEN array_contains(array($arr), t)
           |  THEN 1 ELSE 0 END) AS c$i""".stripMargin
    }
    val hof = docs.selectExpr("doc_id" +: hofCols: _*)
    val k = kernel.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    hof.collect().foreach { r =>
      val exp = r.getInt(1).toLong +: langs.indices.map(i => r.getLong(2 + i))
      assert(k(r.getLong(0)) === exp, s"doc ${r.getLong(0)}")
    }
    // the per-profile counts are only a partition of token hits because
    // the profiles never share a word — pin that invariant
    val all = TextAnalysis.langProfiles.values.flatten.toSeq
    assert(all.distinct.size === all.size, "lang profiles must be disjoint")
  }

  test("rolling_fp kernel == HOF aggregate spec (incl. non-ASCII/empty)") {
    import spark.implicits._
    val docs = Seq(
      "the cat and the hat",
      "der Ütest und die übung ist gut", // non-ASCII code points
      "",                                // empty → 0
      "  padded   text  ",
      "a",                               // single char → its code point
      "😀 emoji pair")                   // supplementary-plane code point
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = docs.selectExpr("doc_id", "rolling_fp(text) AS fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = docs.selectExpr("doc_id",
      """aggregate(split(text, ''), 0L,
        |  (acc, c) -> (acc * 131 + ascii(c)) % 1000000007) AS fp"""
        .stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === hof)
    assert(got(2L) === 0L) // empty string
    assert(got(4L) === 'a'.toLong)
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val fp = TextAnalysis.fingerprint(spark, sf)
    val again = TextAnalysis.fingerprint(spark, sf)
    assert(fp.collect().toSeq.sortBy(_.getLong(0)) ===
      again.collect().toSeq.sortBy(_.getLong(0)))
    // same multiset, different order → different fingerprint
    val two = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val out = two.withColumn("tokens", split(lower(col("text")), " "))
      .selectExpr("aggregate(tokens, 0L, (acc, t) -> xxhash64(acc, t)) AS f")
      .collect().map(_.getLong(0))
    assert(out(0) !== out(1))
  }

  test("ANN: LSH top-k recalls most of brute-force top-k at far lower cost") {
    val bf = SparkEntry.queries("q_ann_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = SparkEntry.queries("q_ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert(bf.nonEmpty)
    val recall = bf.count(lsh.contains).toDouble / bf.size
    // SRP with 4 bands of 4 bits: expected recall ≈ 0.5 at these cosines —
    // the gate is that bucketed candidates find a meaningful fraction
    assert(recall > 0.25, s"LSH recall $recall")
    assert(lsh.nonEmpty)
  }

  test("ANN: IVF with 4/16 probes recalls a strong fraction of brute force") {
    val bf = SparkEntry.queries("q_ann_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall > 0.3, s"IVF recall $recall")
  }

  test("ANN brute force: rank 1 has the highest cosine per query") {
    val rows = SparkEntry.queries("q_ann_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val cos = sorted.map(_.getAs[Double]("cos"))
      assert(cos.toSeq === cos.sorted(Ordering[Double].reverse).toSeq)
      assert(cos.length === Similarity.K)
    }
  }

  test("multimodal: real ImageIO decode matches the generated spec") {
    val decoded = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
      .collect()
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val (w, h, seed) = Multimodal.imageSpec(d.doc_id)
      assert(d.dec_w === w.toLong)
      assert(d.dec_h === h.toLong)
      // PNG gray → 1 band; 24bpp BMP → 3 (identical) bands
      assert(d.dec_bands === (if (d.fmt == "png") 1L else 3L))
      val expSum = (0L until w.toLong * h).map(i => (seed + i) % 256).sum
      assert(d.px_sum === expSum, s"doc ${d.doc_id} fmt ${d.fmt}")
    }
    val agg = SparkEntry.queries("q_multimodal_meta")(spark, sf).collect()(0)
    assert(agg.getAs[Long]("n_assets") === decoded.length)
    assert(agg.getAs[Long]("n_png") + agg.getAs[Long]("n_bmp") ===
      decoded.length)
  }

  test("image decode gate: header fields parsed from bytes equal decoded dims") {
    val rows = SparkEntry.queries("q_image_decode")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hdr_w") === r.getAs[Long]("dec_w"))
      assert(r.getAs[Long]("hdr_h") === r.getAs[Long]("dec_h"))
      val hdr = r.getAs[String]("hdr_hex")
      if (r.getAs[String]("fmt") == "png")
        assert(hdr.startsWith("89504E470D0A1A0A")) // PNG signature bytes
      else assert(hdr === "424D") // "BM"
    }
  }

  test("tfidf: stopwords removed, ≤3 ranked terms per doc, idf sane") {
    val out = SparkEntry.queries("q_tfidf")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !TextAnalysis.stopwords.contains(r.getAs[String]("term"))))
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    // within a doc, rank order follows tfidf desc
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.toSeq === scores.sorted(Ordering[Double].reverse).toSeq)
    }
    assert(out.forall(_.getAs[Double]("tfidf") > 0.0))
  }

  test("multimodal resize: real nearest-neighbor resample of decoded raster") {
    val a = Multimodal.assets(spark, sf)
    val resized = Multimodal.resize(a, Multimodal.RzW, Multimodal.RzH)
    // decoding the RESIZED payload through the real codec must yield the
    // target dims and exactly the nearest-neighbor samples of the source
    val back = Multimodal.extractFeatures(resized).collect()
    back.foreach { d =>
      assert(d.dec_w === Multimodal.RzW.toLong)
      assert(d.dec_h === Multimodal.RzH.toLong)
      val (w, h, seed) = Multimodal.imageSpec(d.doc_id)
      val exp = (for {
        ty <- 0 until Multimodal.RzH; tx <- 0 until Multimodal.RzW
      } yield (seed + (ty * h / Multimodal.RzH).toLong * w
        + (tx * w / Multimodal.RzW)) % 256).sum
      assert(d.px_sum === exp, s"doc ${d.doc_id} fmt ${d.fmt}")
    }
    // deterministic payload bytes
    val once = resized.collect().map(x => x.doc_id -> x.payload.toSeq).toMap
    val again = Multimodal.resize(a, Multimodal.RzW, Multimodal.RzH)
      .collect().map(x => x.doc_id -> x.payload.toSeq).toMap
    assert(once === again)
  }

  test("multimodal frame sampling: max(1, len/stride) frames per asset") {
    val a = Multimodal.assets(spark, sf)
    val frames = Multimodal.frameSamples(a, stride = 64).collect()
      .groupBy(_.doc_id).view.mapValues(_.length).toMap
    val lens = a.collect().map(x => x.doc_id -> x.payload.length).toMap
    assert(frames === lens.map { case (id, n) => id -> math.max(1, n / 64) })
  }
}
