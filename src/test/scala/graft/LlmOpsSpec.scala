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

  test("multimodal: stub features are deterministic; payload bytes = n_chars") {
    val f = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
      .toDF().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // text is ascii words → utf-8 byte length == char count
    assert(f === chars)
    val agg = SparkEntry.queries("q_multimodal_meta")(spark, sf).collect()(0)
    assert(agg.getAs[Long]("n_assets") === chars.size)
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

  test("multimodal resize: target dims set, payload tracks the area ratio") {
    val a = Multimodal.assets(spark, sf)
    val r = Multimodal.resize(a, 320, 240).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.width === 320 && x.height === 240))
    val orig = a.collect().map(x => x.doc_id -> x.payload.length).toMap
    // resample never grows the payload and keeps at least one byte
    assert(r.forall(x => x.payload.length <= orig(x.doc_id) &&
      x.payload.length >= 1))
    // deterministic
    val again = Multimodal.resize(a, 320, 240).collect()
      .map(x => x.doc_id -> x.payload.toSeq).toMap
    assert(r.map(x => x.doc_id -> x.payload.toSeq).toMap === again)
  }

  test("multimodal frame sampling: max(1, len/stride) frames per asset") {
    val a = Multimodal.assets(spark, sf)
    val frames = Multimodal.frameSamples(a, stride = 64).collect()
      .groupBy(_.doc_id).view.mapValues(_.length).toMap
    val lens = a.collect().map(x => x.doc_id -> x.payload.length).toMap
    assert(frames === lens.map { case (id, n) => id -> math.max(1, n / 64) })
  }
}
