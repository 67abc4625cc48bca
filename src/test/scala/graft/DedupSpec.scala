package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import TestSpark._

  test("exact dedup finds exactly the planted duplicate groups") {
    val d = Tables.documents(spark, sf)
    val planted = d.filter(col("doc_id") % 5 === 0).count()
    val groups = SparkEntry.queries("q_exact_dedup")(spark, sf).collect()
    // every planted exact copy forms a duplicate group of size 2 whose
    // keep-first id is the original (min of {id, id+1M})
    assert(groups.length === planted)
    assert(groups.forall(_.getAs[Long]("cnt") === 2))
    assert(groups.forall(_.getAs[Long]("keep_id") < 1000000))
  }

  test("substring dedup equals a Scala brute force; planted dups saturate") {
    // independent in-memory recomputation of the SEMANTIC definition
    // (normalize → distinct w-token spans → cross-doc counts), no
    // fingerprints anywhere — proves the fp-prune-then-verify plan
    // lossless end to end at this scale
    val w = Dedup.SpanTokens
    val docs = Dedup.corpus(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def spansOf(text: String): Seq[String] = {
      // the SHARED normalization (lower, collapse, trim) — one definition
      // across both span operators since the r12 divergence fix
      val ts = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
      val all = if (ts.length < w) Seq(ts.mkString(" "))
        else ts.sliding(w).map(_.mkString(" ")).toSeq
      all.distinct
    }
    val perDoc = docs.map { case (id, t) => id -> spansOf(t) }
    val docCount = perDoc.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val expect = perDoc.map { case (id, ss) =>
      val dupDocs = ss.map(docCount).filter(_ >= 2L)
      (id, ss.length.toLong, dupDocs.length.toLong,
        if (dupDocs.isEmpty) 0L else dupDocs.max,
        BigDecimal(dupDocs.length.toDouble / ss.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_substring_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expect)
    // planted exact copies (+1M ids) share EVERY span with their source:
    // both rows must be fully duplicated (n_dup == n_spans, frac 1.0)
    val byId = got.map(r => r._1 -> r).toMap
    docs.collect { case (id, _) if id >= 1000000 && id < 2000000 => id }
      .foreach { id =>
        assert(byId(id)._3 === byId(id)._2, s"planted copy $id")
        assert(byId(id)._5 === 1.0)
        assert(byId(id - 1000000)._3 === byId(id - 1000000)._2)
      }
    // and some natural (non-planted) doc must NOT be fully duplicated —
    // the pass distinguishes span-grain from doc-grain
    assert(got.exists(r => r._1 < 1000000 && r._3 < r._2))
  }

  test("span mask equals a Scala brute force; planted exact dups erase") {
    // independent in-memory recomputation of the POSITIONAL semantics
    // (coverage is a union of [i, i+w-1] windows over hot-span
    // occurrences, then the rewrite drops covered tokens) — again no
    // fingerprints, so this plus the prune-free oracle pins the fp
    // prune AND the rewrite lossless
    val w = Dedup.SpanTokens
    val docs = Dedup.corpus(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val perDoc = docs.map { case (id, t) =>
      val ts = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
      val occ: Seq[(Int, String)] =
        if (ts.length < w) Seq(0 -> ts.mkString(" "))
        else (0 to ts.length - w).map(i => i -> ts.slice(i, i + w).mkString(" "))
      (id, ts, occ)
    }
    val docCount = perDoc
      .flatMap { case (id, _, occ) => occ.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val expect = perDoc.map { case (id, ts, occ) =>
      val cov = occ.filter(o => docCount(o._2) >= 2)
        .flatMap(o => o._1 to math.min(o._1 + w - 1, ts.length - 1)).toSet
      val kept = ts.zipWithIndex
        .collect { case (t, i) if !cov(i) => t }.mkString(" ")
      (id, ts.length.toLong, cov.size.toLong,
        BigDecimal(cov.size.toDouble / ts.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, kept)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_span_mask")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq
    assert(got === expect)
    // planted exact copies (+1M) share every positional span with their
    // source: both erase completely (frac 1.0, kept_text empty)
    val byId = got.map(r => r._1 -> r).toMap
    docs.collect { case (id, _) if id >= 1000000 && id < 2000000 => id }
      .foreach { id =>
        assert(byId(id)._4 === 1.0, s"planted copy $id")
        assert(byId(id)._5 === "")
        assert(byId(id - 1000000)._4 === 1.0)
      }
    // and some natural doc is untouched end to end — the pass removes
    // repeated spans, not unique text
    assert(got.exists(r => r._1 < 1000000 && r._3 === 0L && r._5.nonEmpty))
  }

  test("span mask edge battery: empty/whitespace/single-token/short-hot") {
    // adversarial corpora through the PRODUCTION plan (spanMaskOf), each
    // checked against the same in-memory positional model as the
    // brute-force test — tokenization boundaries are where a Spark/DuckDB
    // split-semantics drift would hide
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens
    def model(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Double, String)] = {
      val perDoc = docs.map { case (id, t) =>
        val ts = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
        val occ: Seq[(Int, String)] =
          if (ts.length < w) Seq(0 -> ts.mkString(" "))
          else (0 to ts.length - w).map(i => i -> ts.slice(i, i + w).mkString(" "))
        (id, ts, occ)
      }
      val dc = perDoc.flatMap { case (id, _, o) => o.map(_._2).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.length }
      perDoc.map { case (id, ts, occ) =>
        val cov = occ.filter(o => dc(o._2) >= 2)
          .flatMap(o => o._1 to math.min(o._1 + w - 1, ts.length - 1)).toSet
        (id, ts.length.toLong, cov.size.toLong,
          BigDecimal(cov.size.toDouble / ts.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }.mkString(" "))
      }.sortBy(_._1)
    }
    def run(docs: Seq[(Long, String)]) =
      Dedup.spanMaskOf(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getString(4))).toSeq
    val corpora = Seq(
      // two empty docs: both tokenize to [""], the shared ""-span is hot,
      // both erase; the third unique doc is untouched
      Seq(1L -> "", 2L -> "", 3L -> "alpha beta gamma"),
      // whitespace-only normalizes to the empty doc — same hot pair
      Seq(1L -> "   ", 2L -> "\t\n ", 3L -> "delta"),
      // single shared token: short-doc whole-text span, full erase
      Seq(1L -> "x", 2L -> "x", 3L -> "y"),
      // short docs equal AFTER normalization (case + whitespace runs)
      Seq(1L -> "Foo  BAR", 2L -> "foo bar", 3L -> "foo baz"),
      // a ≥w-token doc fully embedded in a longer one: every source span
      // is hot (the Lee-et-al contamination case), prefix erases from the
      // long doc while its unique tail survives
      {
        val span = (1 to w).map(i => s"t$i").mkString(" ")
        Seq(1L -> span, 2L -> (span + " unique tail here"), 3L -> "other")
      },
      // intra-doc repeated span in ONE doc only: ≥2 occurrences but 1 doc
      // — the occurrence-level fp prune lets it through, the exact
      // doc-level verify must kill it (nothing masked)
      {
        val span = (1 to w).map(i => s"r$i").mkString(" ")
        Seq(1L -> (span + " mid " + span), 2L -> "unrelated text")
      })
    corpora.zipWithIndex.foreach { case (c, i) =>
      assert(run(c) === model(c), s"corpus #$i")
    }
    // and the targeted claims, independent of the model:
    assert(run(corpora(0)).take(2).forall(_._5 == ""))         // erased
    assert(run(corpora(4))(1)._5.endsWith("unique tail here")) // tail kept
    assert(run(corpora(5)).forall(_._3 == 0L))                 // verify holds
  }

  test("padded corpora: work-list and rewrite share one normalization") {
    // the r12 divergence: substringDedup didn't trim while spanMask did,
    // so on `'x '`-style padded docs the rewrite erased spans the
    // work-list never flagged. Both operators now share spanNormText;
    // this row drives padded docs through BOTH production plans and
    // asserts (a) padding-insensitive equality with the unpadded corpus
    // and (b) the cross-operator membership invariant on the padded one
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens
    val span = (1 to w).map(i => s"p$i").mkString(" ")
    val clean = Seq(1L -> span, 2L -> (span + " tail"), 3L -> "unique text")
    val padded = Seq(1L -> (span + "  "), 2L -> ("  " + span + " tail"),
      3L -> " unique\t text ")
    def wl(c: Seq[(Long, String)]) =
      Dedup.substringDedupOf(c.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSeq
    def rw(c: Seq[(Long, String)]) =
      Dedup.spanMaskOf(c.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getString(4))).toSeq
    // padding is invisible to both operators (trim + collapse)
    assert(wl(padded) === wl(clean))
    assert(rw(padded) === rw(clean))
    // and on the padded corpus the invariant holds: a doc has repeated
    // spans iff the rewrite masks something in it
    val wlDup = wl(padded).map(r => r._1 -> (r._3 > 0)).toMap
    val rwMask = rw(padded).map(r => r._1 -> (r._3 > 0)).toMap
    assert(wlDup === rwMask)
    assert(wlDup(1L) && wlDup(2L) && !wlDup(3L))
  }

  test("null text raises identically in work-list and rewrite") {
    // previously substringDedup silently DROPPED null-text docs (null
    // propagates through explode) while spanMask emitted them with
    // n_tokens = size(null) = −1 — now both fail loud with the doc id
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(1L -> "some text here", 42L -> null.asInstanceOf[String])
      .toDF("doc_id", "text")
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      Dedup.substringDedupOf(_), Dedup.spanMaskOf(_),
      // the r15 suffix pair shares spanNormText, so the same contract
      Dedup.suffixDedupOf(_), Dedup.suffixMaskOf(_)).foreach { op =>
      val e = intercept[Exception] { op(docs).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("null text") &&
        m.contains("doc_id 42")), e.toString)
    }
  }

  test("planted fp collision at suffix SITE grain: string verify holds, " +
    "in-doc token repeat islands split") {
    // the substring/span-mask collision plant, replayed at the suffix
    // semantic (w=1): "egplaagb" and "mmmmmmmm" share a span_fps
    // fingerprint but are different strings — a collision may only ADD
    // candidates, never fabricate a repeat
    val spark2 = spark
    import spark2.implicits._
    val a = "egplaagb"
    val b = "mmmmmmmm"
    def fp1(t: String) = graft.functions.PolyHash
      .spanFps(org.apache.spark.unsafe.types.UTF8String.fromString(t), 1)
      .toLongArray()(0)
    assert(a !== b)
    assert(fp1(a) === fp1(b), "collision plant broken — kernel changed?")
    // cross-doc: b repeats (2 sites), a rides the same hot fp but its
    // string occurs at ONE site — only b's position may come out covered
    val docs = Seq(1L -> s"$a $b", 2L -> s"$b zebra").toDF("doc_id", "text")
    val got = Dedup.suffixDedupOf(docs, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((1L, 1L, 1L, 1L), (2L, 0L, 0L, 1L)))
    // in-doc only: the colliding pair sits in ONE doc — 2 occurrences
    // make the fp hot, but each STRING has 1 site; nothing is covered
    val solo = Seq(3L -> s"$a $b", 4L -> "other stuff").toDF("doc_id", "text")
    assert(Dedup.suffixDedupOf(solo, w = 1).collect().isEmpty)
    // and the genuine in-doc repeat the site grain MUST see: one token
    // twice with a gap — two single-position islands, not one merged span
    val tok = Seq(5L -> "rep gap rep").toDF("doc_id", "text")
    val iv = Dedup.suffixDedupOf(tok, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(iv === Seq((5L, 0L, 0L, 1L), (5L, 2L, 2L, 1L)))
    val mk = Dedup.suffixMaskOf(tok, w = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(4))).head
    assert(mk === ((3L, 2L, "gap")))
  }

  test("planted fp collision: n_spans correction exact, no fabricated dup") {
    // The in-doc collision-correction path in substringDedupOf and the
    // collision-cannot-fabricate claim in both span operators are DEAD
    // paths under every gate: 30-bit poly fps never collide on real
    // corpora at these SFs. Plant one: "egplaagb" and "mmmmmmmm" roll to
    // the same base-131 mod-1e9+7 fingerprint (meet-in-the-middle over
    // char deltas), so at w=1 they are distinct spans under ONE fp.
    val spark2 = spark
    import spark2.implicits._
    val a = "egplaagb"
    val b = "mmmmmmmm"
    // self-checking precondition: if the kernel's base/modulus ever
    // change, fail HERE, not by silently testing nothing
    def fp1(t: String) = graft.functions.PolyHash
      .spanFps(org.apache.spark.unsafe.types.UTF8String.fromString(t), 1)
      .toLongArray()(0)
    assert(a !== b)
    assert(fp1(a) === fp1(b), "collision plant broken — kernel changed?")

    // cross-doc case: the colliding fp is hot 3 ways (a@1, b@1, b@2) but
    // only b's STRING repeats across docs
    val docs = Seq(1L -> s"$a $b", 2L -> s"$b zebra").toDF("doc_id", "text")
    val wl = Dedup.substringDedupOf(docs, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    // doc 1: distinct fps = 1 but distinct spans = 2 — the exact in-doc
    // correction must add back (k−1); without it n_spans reads 1 and
    // dup_frac reads a false 1.0. And `a` must NOT be reported repeated
    // despite sharing a corpus-hot fp: the string-level verify holds.
    assert(wl === Seq((1L, 2L, 1L, 2L, 0.5), (2L, 2L, 1L, 2L, 0.5)))
    val rw = Dedup.spanMaskOf(docs, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq
    // rewrite: only b's positions mask; the collision never erases `a`
    assert(rw === Seq((1L, 2L, 1L, 0.5, a), (2L, 2L, 1L, 0.5, "zebra")))

    // in-doc-only case: the colliding pair sits in ONE doc (fp hot via 2
    // same-doc occurrences, so its strings DO materialize — the property
    // the correction's exactness proof rests on); nothing is a dup
    val solo = Seq(3L -> s"$a $b", 4L -> "other stuff").toDF("doc_id", "text")
    val wlSolo = Dedup.substringDedupOf(solo, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(wlSolo === Seq((3L, 2L, 0L, 0L, 0.0), (4L, 2L, 0L, 0L, 0.0)))
    assert(Dedup.spanMaskOf(solo, w = 1).collect().forall(_.getLong(2) == 0L))
  }

  test("span mask rewrite is linear-shaped on a heavily-masked long doc") {
    // adversarial row for the kept_text rebuild (array_except over the
    // covered-position set): a ~10⁴-token doc whose bulk is a hot span
    // repeat — under the old filter(!array_contains) form this doc alone
    // cost n_tokens·n_masked ≈ 10⁸ comparisons; the set-difference form
    // is O(n). Correctness: kept text is exactly the unique suffix, in
    // order, and the planted mask fraction is exact
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens
    val hot = (1 to w).map(i => s"h$i").mkString(" ")
    val reps = 10000 / w // ~10⁴ hot tokens
    val body = Seq.fill(reps)(hot).mkString(" ")
    val tailToks = Seq("uniq1", "uniq2", "uniq3")
    val docs = Seq(1L -> (body + " " + tailToks.mkString(" ")),
      2L -> hot, 3L -> "other words").toDF("doc_id", "text")
    val got = Dedup.spanMaskOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .sortBy(_._1)
    val nBody = reps * w
    assert(got(0) === ((1L, (nBody + 3).toLong, nBody.toLong,
      tailToks.mkString(" "))))
    assert(got(1) === ((2L, w.toLong, w.toLong, "")))
    assert(got(2)._3 === 0L)
  }

  test("span work-list and rewrite agree on who is affected") {
    // q_substring_dedup (distinct-span grain) and q_span_mask (positional
    // coverage grain) share one hot-span definition, so membership must
    // coincide exactly: a doc carries repeated spans iff the rewrite
    // masks something in it — a drift here means the two operators'
    // span derivations diverged
    val wl = SparkEntry.queries("q_substring_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_dup
    val rw = SparkEntry.queries("q_span_mask")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_masked
    assert(wl.keySet === rw.keySet)
    wl.foreach { case (id, nDup) =>
      assert((nDup > 0) === (rw(id) > 0), s"doc $id: n_dup=$nDup " +
        s"but n_masked=${rw(id)}")
    }
  }

  // -- suffix-grain maximal repeated-span pass (q_suffix_dedup) ----------

  /** All-lengths brute force of the Lee-et-al semantics — enumerates
    * EVERY span of EVERY length ≥ w (w-grams are an implementation
    * detail the production plan uses; this model must not), counts
    * occurrences at (doc, pos) SITE grain, and merges the union of
    * repeated spans into maximal intervals. Agreement with the
    * production plan proves both the fp prune AND the w-gram coverage
    * identity (covered-by-≥w-repeat ⇔ covered-by-repeated-w-gram). */
  private def bruteSuffixSpans(docs: Seq[(Long, String)], w: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    }
    // occurrence sites of every span of every length in [w, n] — for a
    // short doc (<w tokens) the kernel convention: its whole text is its
    // one span
    val sites = scala.collection.mutable.Map
      .empty[Seq[String], Int].withDefaultValue(0)
    for ((_, ts) <- toks) {
      if (ts.length < w) sites(ts) += 1
      else for {
        len <- w to ts.length
        i <- 0 to ts.length - len
      } sites(ts.slice(i, i + len)) += 1
    }
    toks.flatMap { case (id, ts) =>
      val covered =
        if (ts.length < w) {
          if (sites(ts) >= 2) ts.indices.toSet else Set.empty[Int]
        } else (for {
          len <- w to ts.length
          i <- 0 to ts.length - len
          if sites(ts.slice(i, i + len)) >= 2
          p <- i until i + len
        } yield p).toSet
      val ps = covered.toSeq.sorted
      val intervals = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: acc, p) if p == e + 1 => (s, p) :: acc
        case (acc, p)                         => (p, p) :: acc
      }.reverse
      intervals.map { case (s, e) =>
        (id, s.toLong, e.toLong, (e - s + 1).toLong)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("suffix dedup equals the all-lengths brute force on the corpus") {
    // the catalog query (planted exact dups, near dups AND the %11
    // in-doc self-repeat branch) against the arbitrary-length model.
    // The corpus brute force restricts candidate lengths to [w, 2w-1]
    // plus each whole doc — sound here because a repeated span of
    // length L ≥ 2w contains a repeated span of length in [w, 2w-1] at
    // every alignment, so the COVERAGE union is identical (the same
    // identity the operator rests on, applied once more to keep the
    // O(n·L) enumeration tractable at corpus scale); the adversarial
    // test below runs the genuinely unbounded enumeration.
    val w = Dedup.SpanTokens
    val docs = Dedup.suffixCorpus(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    }
    val sites = scala.collection.mutable.Map
      .empty[Seq[String], Int].withDefaultValue(0)
    for ((_, ts) <- toks) {
      if (ts.length < w) sites(ts) += 1
      else for {
        len <- w to math.min(2 * w - 1, ts.length)
        i <- 0 to ts.length - len
      } sites(ts.slice(i, i + len)) += 1
    }
    val expect = toks.flatMap { case (id, ts) =>
      val covered =
        if (ts.length < w) {
          if (sites(ts) >= 2) ts.indices.toSet else Set.empty[Int]
        } else (for {
          len <- w to math.min(2 * w - 1, ts.length)
          i <- 0 to ts.length - len
          if sites(ts.slice(i, i + len)) >= 2
          p <- i until i + len
        } yield p).toSet
      val ps = covered.toSeq.sorted
      val intervals = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: acc, p) if p == e + 1 => (s, p) :: acc
        case (acc, p)                         => (p, p) :: acc
      }.reverse
      intervals.map { case (s, e) =>
        (id, s.toLong, e.toLong, (e - s + 1).toLong)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_suffix_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
    // planted whole-doc dups (+1M) come out as ONE full-width interval —
    // the arbitrary-length grain, not a w-token one
    val byId = got.groupBy(_._1)
    docs.collect { case (id, t) if id >= 1000000 && id < 2000000 =>
      val n = t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ", -1).length
      val iv = byId(id)
      assert(iv.length === 1 && iv.head._2 === 0L &&
        iv.head._4 === n.toLong, s"planted copy $id: $iv")
    }
    // planted in-doc self-repeats (+3M) are fully covered too — the
    // site-grain semantic the doc-grain pass cannot see. Only doubles
    // whose BASE had ≥ w tokens qualify: a doubled (<w)-token doc has no
    // repeated w-gram (the two copies sit closer than a window apart and
    // the short-doc whole-text convention applies to neither side), so
    // it correctly emits nothing — the corpus holds two such docs.
    val fullSelfReps = docs.collect {
      case (id, t) if id >= 3000000 &&
        t.toLowerCase.replaceAll("\\s+", " ").trim
          .split(" ", -1).length >= 2 * w => id -> t
    }
    assert(fullSelfReps.nonEmpty)
    fullSelfReps.foreach { case (id, t) =>
      val n = t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ", -1).length
      val iv = byId(id)
      assert(iv.length === 1 && iv.head._2 === 0L &&
        iv.head._4 === n.toLong, s"self-repeat $id: $iv")
    }
  }

  test("suffix dedup adversarial battery: nested, overlapping, in-doc, " +
    "whole-doc, seam") {
    // hand-built corpus through the PRODUCTION plan vs the genuinely
    // unbounded all-lengths brute force, then EXACT expected intervals.
    // t1..t40 / u.. / v.. tokens keep spans disjoint by construction.
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens // 16
    def tk(p: String, r: Range) = r.map(p + _).mkString(" ")
    val A40 = tk("a", 1 to 40)    // 40-token block
    val B20 = tk("b", 1 to 20)    // 20-token block
    val uniq = tk("u", 1 to 10)
    val docs = Seq(
      // nested repeats: doc 1 and 2 share the full 40-token A block
      // (one maximal 40-token repeat); its interior 16-grams also repeat
      // but must be ABSORBED, not emitted separately
      1L -> (A40 + " " + uniq),
      2L -> (tk("v", 1 to 5) + " " + A40),
      // overlapping maximal repeats with DIFFERENT partners: doc 3 =
      // X(1..20) ++ Y(1..20) where X's 20-gram repeats in doc 4 and Y's
      // in doc 5 — doc 3's two overlapping-window unions merge into one
      // 40-token interval; docs 4/5 each get their own 20-token one
      3L -> (tk("x", 1 to 20) + " " + tk("y", 1 to 20)),
      4L -> (tk("x", 1 to 20) + " " + tk("w", 1 to 10)),
      5L -> (tk("z", 1 to 10) + " " + tk("y", 1 to 20)),
      // in-doc periodic repeat, NO cross-doc partner: B20 twice in one
      // doc — site grain covers all 40 tokens; a doc-grain pass sees 0
      6L -> (B20 + " " + B20),
      // whole-doc duplicate pair, exactly w tokens
      7L -> tk("c", 1 to w),
      8L -> tk("c", 1 to w),
      // short-doc (<w) duplicate pair: kernel whole-text convention
      9L -> "p q r",
      10L -> "p q r",
      // short doc with no partner: no output row
      11L -> "lone short doc",
      // long doc with no repeats: no output row
      12L -> tk("n", 1 to 30)
    )
    val got = Dedup.suffixDedupOf(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === bruteSuffixSpans(docs, w))
    assert(got === Seq(
      (1L, 0L, 39L, 40L),   // maximal 40, nested 16-grams absorbed
      (2L, 5L, 44L, 40L),   // same block at an offset
      (3L, 0L, 39L, 40L),   // two overlapping partners merged
      (4L, 0L, 19L, 20L),
      (5L, 10L, 29L, 20L),
      (6L, 0L, 39L, 40L),   // in-doc repeat, site grain
      (7L, 0L, 15L, 16L),   // exact-w whole-doc pair
      (8L, 0L, 15L, 16L),
      (9L, 0L, 2L, 3L),     // short-doc whole-text convention
      (10L, 0L, 2L, 3L)))
  }

  test("suffix dedup seam gap: two repeats separated by one unique token " +
    "stay two intervals") {
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens
    def tk(p: String, r: Range) = r.map(p + _).mkString(" ")
    val L = tk("l", 1 to w)
    val R = tk("r", 1 to w)
    val docs = Seq(
      1L -> (L + " gapword " + R), // two w-repeats with a 1-token gap
      2L -> (tk("q", 1 to 3) + " " + L),
      3L -> (R + " " + tk("s", 1 to 3))
    )
    val got = Dedup.suffixDedupOf(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === bruteSuffixSpans(docs, w))
    // doc 1 must NOT merge across the uncovered gap token at position w
    assert(got.filter(_._1 == 1L) ===
      Seq((1L, 0L, (w - 1).toLong, w.toLong),
        (1L, (w + 1).toLong, (2 * w).toLong, w.toLong)))
  }

  test("suffix dedup randomized corpora: production plan == all-lengths " +
    "brute force at w=4") {
    // seeded random corpora over a TINY vocabulary at a small w, so rich
    // repeat structure arises naturally — many intervals per doc, island
    // boundaries at doc edges, repeats of every length: the adversarial
    // cases the hand-built battery plants, in volume. The brute force is
    // the genuinely unbounded all-lengths enumeration.
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("ga", "gb", "gc", "gd", "ge")
    for (trial <- 1 to 5) {
      val docs = (1L to 12L).map { id =>
        val n = 1 + rnd.nextInt(40)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = Dedup.suffixDedupOf(docs.toDF("doc_id", "text"), w = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === bruteSuffixSpans(docs, 4), s"trial $trial: $docs")
    }
  }

  test("suffix mask applies exactly the reported intervals; site grain " +
    "erases what doc grain cannot see") {
    val spark2 = spark
    import spark2.implicits._
    val w = Dedup.SpanTokens
    def tk(p: String, r: Range) = r.map(p + _).mkString(" ")
    val B20 = tk("b", 1 to 20)
    val docs = Seq(
      1L -> (tk("a", 1 to 40) + " " + tk("u", 1 to 10)),
      2L -> (tk("v", 1 to 5) + " " + tk("a", 1 to 40)),
      // the semantics wedge: an in-doc periodic repeat with NO cross-doc
      // partner — site grain must erase it, doc grain must not touch it
      6L -> (B20 + " " + B20),
      12L -> tk("n", 1 to 30))
    val df = docs.toDF("doc_id", "text")
    val mask = Dedup.suffixMaskOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))).toMap
    // 1) the rewrite applies EXACTLY the reported intervals: n_masked is
    //    the interval-length sum, kept_text is the positional complement
    val ivs = Dedup.suffixDedupOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for ((id, t) <- docs) {
      val ts = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
      val spans = ivs.getOrElse(id, Array.empty)
      val covered = spans.flatMap(s => s._2 to s._3).map(_.toInt).toSet
      val (n, m, frac, kept) = mask(id)
      assert(n === ts.length.toLong)
      assert(m === spans.map(_._4).sum, s"doc $id")
      assert(frac === BigDecimal(covered.size.toDouble / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(kept === ts.zipWithIndex
        .collect { case (tok, i) if !covered(i) => tok }.mkString(" "),
        s"doc $id kept_text")
    }
    // 2) every input doc emits exactly one row (uncovered pass through)
    assert(mask.keySet === docs.map(_._1).toSet)
    assert(mask(12L)._2 === 0L && mask(12L)._4.nonEmpty)
    // 3) the wedge: doc 6 erases completely under SITE grain…
    assert(mask(6L)._3 === 1.0 && mask(6L)._4 === "")
    // …while the doc-grain spanMask pass leaves it fully intact (its
    // spans repeat only WITHIN the doc — ≥2-distinct-docs never fires)
    val dg = Dedup.spanMaskOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dg(6L) === 0L, "doc-grain pass must not see the in-doc repeat")
  }

  test("connected components: chain converges to min label per component") {
    val spark2 = spark
    import spark2.implicits._
    // two components: a 4-node chain 1-2-3-4 and an isolated edge 10-11;
    // chain diameter 3 exercises multiple propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dedup survivors: every group's survivor is its minimum member") {
    val rows = SparkEntry.queries("q_dedup_survivors")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("survivor_id") < r.getAs[Long]("max_member"))
      assert(r.getAs[Long]("n_members") >= 2)
    }
  }

  test("minhash LSH finds the planted near-dup pairs without all-pairs") {
    val found = Dedup.minhashNearDup(spark, sf, 0.5).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 2000000L)).toSet
    // recall: two appended tokens on a ≥48-char doc keep Jaccard ≥ 0.5, and
    // 5 bands × 4 rows makes a miss overwhelmingly unlikely
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall > 0.9, s"recall=$recall")
    // candidate generation is bucketed: pair volume must stay near the
    // true-duplicate count, not n²/2 (500+ docs → >125k all-pairs)
    val candidates = Dedup.candidatePairs(
      Dedup.signatures(Dedup.corpus(spark, sf))).count()
    assert(candidates < 10L * expected.size + 100,
      s"candidate explosion: $candidates")
  }

  test("LSH degenerate bucket drops whole before pair expansion (MaxBucket)") {
    // the Dedup-side twin of SimilarityScaleSpec's hot-bucket row: the
    // MaxBucket=100 cap at candidatePairs' bucket filter was otherwise
    // untested (real corpora never produce a >100-member bucket at these
    // SFs). 150 copies of one boilerplate text put 150 members in every
    // band bucket — uncapped that is C(150,2)=11,175 pairs; capped, the
    // bucket drops WHOLE (one filtered row, no expansion) and only the
    // planted 2-copy pair survives
    val spark2 = spark
    import spark2.implicits._
    val boiler = "copyright footer all rights reserved contact us terms"
    val docs = ((0 until 150).map(i => i.toLong -> boiler) ++
      Seq(900L -> "a genuinely unique pair of documents right here",
          901L -> "a genuinely unique pair of documents right here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(Dedup.signatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((900L, 901L)))
  }

  test("simhash chunk banding drops a degenerate bucket whole") {
    // same cap, simhash side: 150 identical docs put 150 members in every
    // 16-bit chunk bucket (> MaxBucket=100 → dropped whole); the planted
    // identical pair (hamming 0) shares its own 2-member buckets and is
    // the only pair that may survive
    val spark2 = spark
    import spark2.implicits._
    val boiler = "copyright footer all rights reserved contact us terms"
    val docs = ((0 until 150).map(i => i.toLong -> boiler) ++
      Seq(900L -> "a genuinely unique pair of documents right here",
          901L -> "a genuinely unique pair of documents right here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((900L, 901L)))
  }

  test("incremental dedup: history bucket cap hits ONLY the near path") {
    // blast radius of the capped history index: a batch doc near a
    // 150-copy boilerplate history classifies `new` (its band buckets are
    // dropped), while the exact content-hash path is cap-IMMUNE and a
    // near-copy of a unique history doc still matches. Determinism trick:
    // "a b c a b c a b c" has the SAME distinct 3-gram shingle set as
    // "a b c a b c" (so every band signature matches — no LSH luck
    // involved) but a different md5 (so the exact path can't catch it).
    val spark2 = spark
    import spark2.implicits._
    val boiler = "a b c a b c"
    val uniq = "u v w u v w"
    val hist = ((0 until 150).map(i => i.toLong -> boiler) ++
      Seq(500L -> uniq)).toDF("doc_id", "text")
    val batch = Seq(
      1000L -> boiler,                  // exact copy -> exact_dup
      1001L -> "a b c a b c a b c",     // near boilerplate -> capped -> new
      1002L -> "u v w u v w u v w",     // near the unique doc -> near_dup
      1003L -> "totally fresh content never seen before"
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedupOf(hist, batch).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq(
      (1000L, "exact_dup", 0L),
      (1001L, "new", -1L),
      (1002L, "near_dup", 500L),
      (1003L, "new", -1L)))
  }

  test("native simhash64 kernel is bit-exact with the HOF executable spec") {
    // the corpus plus edge cases the kernel must agree on: empty string,
    // trailing/leading spaces (empty tokens), single token
    val spark2 = spark
    import spark2.implicits._
    // non-ASCII (BMP) chars included: the token hashes roll CODE POINTS,
    // and the DuckDB oracle's length()/unicode() must see the same values
    // — the q_simhash_neardup oracle used byte-length strlen() until r6,
    // which only passed because the corpus is ASCII
    val edge = Seq((9000001L, ""), (9000002L, " x"), (9000003L, "x "),
      (9000004L, "one"), (9000005L, "a b c d e"),
      (9000006L, "über die straße 中文 test"))
      .toDF("doc_id", "text")
    val docs = Dedup.corpus(spark, sf).limit(200).unionByName(edge)
    val native = Dedup.simhash(docs).withColumnRenamed("simhash", "n")
    val hof = Dedup.simhashHof(docs).withColumnRenamed("simhash", "h")
    val diff = native.join(hof, "doc_id").filter(col("n") =!= col("h")).count()
    assert(diff === 0L)
  }

  test("native shingles3+minhash_sigs kernels match the HOF executable spec") {
    val spark2 = spark
    import spark2.implicits._
    val edge = Seq((9000001L, ""), (9000002L, " x y z"), (9000003L, "x "),
      (9000004L, "one two"), (9000005L, "a b c d e"), (9000006L, "a b a b a"),
      (9000007L, "naïve café résumé über tokens"))
      .toDF("doc_id", "text")
    val docs = Dedup.corpus(spark, sf).limit(200).unionByName(edge)
    val native = Dedup.signaturesAffine(docs)
      .select(col("doc_id"), col("shingles").as("sh_n"), col("minhash").as("mh_n"))
    val hof = Dedup.signaturesHof(docs)
      .select(col("doc_id"), col("shingles").as("sh_h"), col("minhash").as("mh_h"))
    val diff = native.join(hof, "doc_id")
      .filter(col("sh_n") =!= col("sh_h") || col("mh_n") =!= col("mh_h"))
      .count()
    assert(diff === 0L)
  }

  test("native tabulation_sigs kernel matches the HOF executable spec") {
    // the r10 PRODUCTION family: the codegen kernel must be bit-exact with
    // the interpreted tabSlotExpr HOF form on the corpus plus the same
    // edge cases the affine equivalence pins (incl. non-ASCII code points)
    val spark2 = spark
    import spark2.implicits._
    val edge = Seq((9000001L, ""), (9000002L, " x y z"), (9000003L, "x "),
      (9000004L, "one two"), (9000005L, "a b c d e"), (9000006L, "a b a b a"),
      (9000007L, "naïve café résumé über tokens"),
      // astral-plane code points (surrogate pairs in UTF-16): the kernel
      // rolls codePointAt/charCount while the HOF spec rolls
      // split(s,'') + ascii() — both must see ONE value per code point
      (9000008L, "a 🎉 b 😀😀 c d"))
      .toDF("doc_id", "text")
    val docs = Dedup.corpus(spark, sf).limit(200).unionByName(edge)
    val native = Dedup.signatures(docs)
      .select(col("doc_id"), col("shingles").as("sh_n"), col("minhash").as("mh_n"))
    val hof = Dedup.signaturesTabHof(docs)
      .select(col("doc_id"), col("shingles").as("sh_h"), col("minhash").as("mh_h"))
    val diff = native.join(hof, "doc_id")
      .filter(col("sh_n") =!= col("sh_h") || col("mh_n") =!= col("mh_h"))
      .count()
    assert(diff === 0L)
  }

  test("connected components throws instead of returning split components") {
    val spark2 = spark
    import spark2.implicits._
    // a 5-node chain has diameter 4; with the first propagation folded
    // into init, maxIter=1 still can't both finish propagating AND confirm
    // the fixpoint (the sum-unchanged round) → must throw, not split
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1).collect()
    }
  }

  test("pointer jumping: a 200-deep chain converges in O(log n) rounds") {
    val spark2 = spark
    import spark2.implicits._
    // one-hop min propagation needs ~199 rounds for this chain — far past
    // maxIter=30; the pointer-jumping step must bring it to ~⌈log₂ 200⌉+2
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(chain, maxIter = 30).collect()
    assert(labels.length === 200)
    assert(labels.forall(_.getLong(1) === 1L)) // single component, min label
  }

  test("incremental dedup classifies every planted batch row correctly") {
    val rows = SparkEntry.queries("q_incr_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    rows.foreach { case (id, (status, matched)) =>
      if (id >= 3000000) {
        // reversed text shares no shingles with anything in history
        assert(status === "new" && matched === -1L, s"doc $id")
      } else if (id >= 2000000) {
        // two appended tokens: when the banding surfaces the pair the
        // Jaccard verify must accept it with the origin as the smallest
        // match — but banding recall is < 1 by design (a true pair can
        // miss all 5 bands at tiny SF), so 'new' is a legitimate outcome
        // for SOME rows; the recall floor is asserted below
        assert(status === "near_dup" || status === "new", s"doc $id")
        if (status === "near_dup")
          assert(matched <= id - 2000000, s"doc $id matched $matched")
      } else {
        // exact copy: content hash hits the origin (min doc per hash)
        assert(status === "exact_dup" && matched === id - 1000000,
          s"doc $id matched $matched")
      }
    }
    // every planted batch row is classified exactly once
    val d = Tables.documents(spark, sf).count()
    val expected = (0L until d).count(_ % 5 == 0) +
      (0L until d).count(_ % 7 == 0) + (0L until d).count(_ % 9 == 0)
    assert(rows.size === expected)
    // banding recall floor on the planted near dups
    val nearIds = rows.keys.filter(id => id >= 2000000 && id < 3000000)
    val caught = nearIds.count(id => rows(id)._1 == "near_dup")
    assert(caught.toDouble / nearIds.size > 0.7,
      s"near-dup recall ${caught.toDouble / nearIds.size}")
  }

  test("minhash_agg == explode/groupBy slot-min; stable under repartition") {
    // the mergeable aggregate must equal its declarative statement (the
    // oracle's form) and, being a min-merge, must not care how rows are
    // distributed across partial buffers
    val grouped = Dedup.signatures(Dedup.corpus(spark, sf).limit(300))
      .withColumn("g", col("doc_id") % 7)
      .select("g", "minhash")
    def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val native = sigMap(
      grouped.groupBy("g").agg(expr("minhash_agg(minhash)").as("sig")))
    val replay = grouped
      .select(col("g"), posexplode(col("minhash")))
      .groupBy("g", "pos").agg(min("col").as("v"))
      .groupBy("g")
      .agg(expr("transform(array_sort(collect_list(struct(pos, v))), " +
        "s -> s.v)").as("sig"))
    assert(native === sigMap(replay))
    assert(native === sigMap(grouped.repartition(13)
      .groupBy("g").agg(expr("minhash_agg(minhash)").as("sig"))))
    assert(native.values.forall(_.size === Dedup.NumHashes))
  }

  test("minhash_agg rejects nullable-element arrays at analysis") {
    // ArrayData.toLongArray would read a NULL element as 0, and 0 wins
    // every slot min — reject the type up front instead of corrupting
    import spark.implicits._
    val df = Seq((1L, Seq[Option[Long]](Some(1L), None)))
      .toDF("g", "minhash") // encodes as array<bigint> containsNull=true
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(expr("minhash_agg(minhash)")).collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
  }

  test("simhash: identical texts hash equal; near texts within Hamming 10") {
    val sh = Dedup.simhash(Dedup.corpus(spark, sf))
    val d = Tables.documents(spark, sf)
    val exactIds = d.filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exactIds.foreach { id =>
      assert(m(id) === m(id + 1000000L), s"doc $id exact copy hash differs")
    }
    val pairs = SparkEntry.queries("q_simhash_neardup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val nearIds = d.filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    val hit = nearIds.count(id => pairs.contains((id, id + 2000000L)))
    assert(hit.toDouble / nearIds.length > 0.8,
      s"simhash recall ${hit.toDouble / nearIds.length}")
  }

  test("bloom prefilter dedup: exact classification, one join in the plan") {
    val df = SparkEntry.queries("q_bloom_dedup")(spark, sf)
    val rows = df.collect()
    val d = Tables.documents(spark, sf)
    val nCopies = d.filter(col("doc_id") % 4 === 0).count()
    // every +1M planted exact copy is confirmed against its original
    val dups = rows.filter(_.getAs[String]("status") == "exact_dup")
    assert(dups.count(r => r.getAs[Long]("doc_id") >= 1000000L &&
      r.getAs[Long]("doc_id") < 2000000L) === nCopies)
    dups.foreach(r => assert(!r.isNullAt(r.fieldIndex("matched_id"))))
    // reversed-text rows are new (bloom FPs must be corrected by the
    // confirm join, so none of them may surface as dup)
    val fresh = rows.filter(_.getAs[Long]("doc_id") >= 3000000L)
    assert(fresh.nonEmpty)
    assert(fresh.forall(_.getAs[String]("status") == "new"))
    // plan shape: the probe is a codegen'd might_contain scan, and ONLY
    // the bloom-maybe branch joins — exactly one join in the whole plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE prints the pre-adaptive plan too
    assert(p.contains("might_contain"), p.take(2000))
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins === 1, s"expected 1 join (maybe-branch only), got $joins")
  }

  test("prefix-filter similarity join equals brute force over all pairs") {
    import graft.operators.Dedup
    val got = Dedup.prefixSimJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // brute force: every corpus pair's exact token-set Jaccard, in
    // memory, then the same undirected per-doc rollup
    val sets = Dedup.corpus(spark, sf)
      .filter(col("doc_id") % 4 === 0) // the query's deterministic slice
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
      .sortBy(_._1)
    val sym = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (i <- sets.indices; j <- i + 1 until sets.length) {
      val (a, sa) = sets(i); val (b, sb) = sets(j)
      val inter = sa.intersect(sb).size.toLong
      val uni = sa.size.toLong + sb.size.toLong - inter
      if (inter * 10 >= uni * 9) {
        val jac = BigDecimal(inter.toDouble / uni)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        sym += ((a, b, jac)); sym += ((b, a, jac))
      }
    }
    val expect = sym.groupBy(_._1).map { case (d, ps) =>
      val best = ps.map(p => (p._3, -p._2)).max // (jac desc, id asc)
      d -> (ps.length.toLong, -best._2, best._1)
    }
    assert(got.keySet === expect.keySet,
      s"doc sets differ: missing=${(expect.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expect.keySet).take(3)}")
    got.foreach { case (d, (n1, b1, j1)) =>
      val (n2, b2, j2) = expect(d)
      assert(n1 === n2 && b1 === b2 && math.abs(j1 - j2) < 1e-6, s"doc $d")
    }
    // the planted pairs guarantee true positives at both jaccard levels
    assert(got.values.exists(_._3 == 1.0))
    assert(got.values.exists(v => v._3 < 1.0))
  }

  test("sorted_intersect_count == size(array_intersect) on sorted distinct " +
    "arrays (real corpus keys + edges)") {
    import graft.operators.Dedup
    // real data: every consecutive pair of the sim-join's own sorted key
    // arrays — the exact input population the kernel replaced
    // array_intersect for (r20)
    val toks = Dedup.corpus(spark, sf)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), explode(array_distinct(
        split(regexp_replace(lower(col("text")), "\\s+", " "), " ")))
        .as("t"))
      .filter(length(col("t")) > 0)
    val dfreq = toks.groupBy("t").agg(count(lit(1)).as("df"))
    val arr = toks.join(dfreq, "t")
      .select(col("doc_id"),
        format_string("%012d|%s", col("df"), col("t")).as("k"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("k"))).as("ks"))
      .orderBy("doc_id").limit(200)
    val rows = arr.collect().map(_.getSeq[String](1))
    val pairs = rows.sliding(2).filter(_.length == 2).toSeq
    assert(pairs.nonEmpty)
    val spark2 = spark
    import spark2.implicits._
    val df = pairs.map(p => (p(0), p(1))).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    df.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(df.exists(_.getLong(0) > 0), "vacuous: no overlapping pair")
    // edge shapes: empty/disjoint/identical/subset/single
    val edges = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("d", "e")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "c"), Seq("a", "b", "c", "d")),
      (Seq("x"), Seq("x"))).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    edges.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("minhash accuracy audit: slot recount, unbiasedness band, coverage") {
    import graft.operators.Dedup
    val rows = SparkEntry.queries("q_mh_accuracy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // one row per planted near pair — full coverage of the ground truth
    val planted = Dedup.corpus(spark, sf)
      .filter(col("doc_id") < 1000000 && col("doc_id") % 7 === 0).count()
    assert(rows.length.toLong === planted)
    // recount one pair's slot matches + exact jaccard from the raw
    // signature/shingle arrays
    val (a, b) = (rows.head._1, rows.head._2)
    val sig = Dedup.signaturesAffine(Dedup.corpus(spark, sf))
      .filter(col("doc_id").isin(a, b)).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2)))
      .toMap
    val m = sig(a)._2.zip(sig(b)._2).count { case (x, y) => x == y }.toLong
    assert(rows.head._3 === m, "slot matches recount")
    val inter = sig(a)._1.toSet.intersect(sig(b)._1.toSet).size.toDouble
    val uni = sig(a)._1.toSet.union(sig(b)._1.toSet).size.toDouble
    assert(math.abs(rows.head._5 - inter / uni) < 1e-6, "exact jaccard")
    // estimator audit bands (measured at all three SFs): mean ~0.04,
    // median ~0.03, with a ~1% pathological tail from the affine
    // family's correlated minima (see the operator scaladoc) — pin the
    // aggregates AND that the tail stays a small minority
    rows.foreach { case (pa, _, _, est, jac, err) =>
      assert(math.abs(est - jac) - err < 1e-6, s"pair $pa err column")
    }
    val errs = rows.map(_._6).sorted
    val mean = errs.sum / errs.length
    assert(mean <= 0.08, s"mean |est-jac| $mean too high — estimator broken")
    assert(errs(errs.length / 2) <= 0.06, "median error out of band")
    val tail = errs.count(_ > 0.2).toDouble / errs.length
    assert(tail <= 0.05, s"pathological tail $tail — correlated-minima " +
      "fraction grew beyond the measured ~1%")
  }

  test("tabulation audit: worst case collapses to the binomial envelope") {
    import graft.operators.Dedup
    val tab = SparkEntry.queries("q_mh_tabulation")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(5))))
    val aff = SparkEntry.queries("q_mh_accuracy")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    // same pair universe as the affine audit — directly comparable rows
    assert(tab.map(_._1).toSet === aff.keySet)
    val errs = tab.map(_._2._2)
    // the correlated-minima catastrophes (0.6+ observed affine-side at
    // this SF) cannot occur: the worst tabulation error stays inside
    // the plain n=20 binomial envelope, and the mean holds at the
    // discretization floor
    assert(errs.max <= 0.3, s"tabulation max ${errs.max} — XOR mixing " +
      "failed to break the minima correlation")
    assert(errs.sum / errs.length <= 0.08)
    assert(aff.values.max > errs.max,
      "affine worst case no longer exceeds tabulation — plant changed?")
    // independent in-memory recount of one pair's slot matches: polyhash
    // each shingle, tabulate (XOR of four per-byte table values), min per
    // slot — the executable spec of the HOF expression
    val (a, b) = tab.head._1
    val sh = Dedup.signatures(Dedup.corpus(spark, sf))
      .filter(col("doc_id").isin(a, b)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 2147483647L)
    def slot(j: Int, p: Long): Long =
      (0 to 3).map { k =>
        (((2654435761L * (4 * j + k + 1)) % 2147483647L) *
          (((p >> (8 * k)) & 255L) + 17L) +
          (40503L * (4 * j + k + 1) + 7L) % 2147483647L) % 2147483647L
      }.reduce(_ ^ _)
    def sig(d: Long): Seq[Long] = {
      val ps = sh(d).map(poly)
      (0 until Dedup.NumHashes).map(j => ps.map(slot(j, _)).min)
    }
    val m = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
    assert(m === tab.head._2._1, "tabulation slot recount")
  }

  test("source signatures: merged-sketch estimate tracks exact union Jaccard") {
    // the group-level analogue of the q_mh_accuracy audit: per source
    // pair, the minhash_agg slot-agreement ESTIMATE (what q_source_sim
    // emits) vs the EXACT Jaccard of the sources' unioned shingle sets,
    // recounted in memory — pins that element-wise min of per-doc
    // signatures IS the union's signature and that the r10 tabulation
    // family keeps the estimator inside the n=20 binomial envelope at
    // source granularity (no correlated-minima tail)
    val est = SparkEntry.queries("q_source_sim")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(est.nonEmpty)
    val perSource = Tables.documents(spark, sf)
      .withColumn("shingles", expr(
        "shingles3(regexp_replace(lower(text), '\\\\s+', ' '))"))
      .select(col("source"), col("shingles")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.flatMap(_.getSeq[String](1)).toSet }
    val errs = est.toSeq.map { case ((a, b), e) =>
      val (sa, sb) = (perSource(a), perSource(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      math.abs(e - exact)
    }
    val mean = errs.sum / errs.size
    assert(mean <= 0.10, s"mean |est-exact| $mean — estimator broken")
    assert(errs.max <= 0.30, s"max |est-exact| ${errs.max} — tail " +
      "exceeds the binomial envelope")
    // MERGE IDENTITY — the structural form of the envelope claim: the
    // UDAF's element-wise min of per-doc TABULATION signatures must be
    // BIT-IDENTICAL to tabulation_sigs evaluated directly on the
    // source's unioned shingle set (slot j of the union = min over the
    // union's slot hashes = min of per-doc minima). With the identity
    // pinned, the merged estimator IS the single-set tabulation
    // estimator over the union, so it inherits the q_mh_tabulation
    // binomial error envelope by construction — the empirical band
    // above is corroboration, not the proof
    val spark2 = spark
    import spark2.implicits._
    val mergedSigs = Tables.documents(spark, sf)
      .withColumn("shingles", expr(
        "shingles3(regexp_replace(lower(text), '\\\\s+', ' '))"))
      .withColumn("minhash",
        expr(s"tabulation_sigs(shingles, ${Dedup.NumHashes})"))
      .groupBy("source").agg(expr("minhash_agg(minhash)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(mergedSigs.keySet === perSource.keySet)
    perSource.foreach { case (s, set) =>
      val unionSig = Seq(set.toSeq).toDF("shingles")
        .select(expr(s"tabulation_sigs(shingles, ${Dedup.NumHashes})"))
        .head.getSeq[Long](0)
      assert(mergedSigs(s) === unionSig, s"merge identity broken for $s")
    }
    // ENVELOPE SIDE BY SIDE (the carried audit row): with the merge
    // identity pinned above, the merged estimator should EMPIRICALLY sit
    // inside the same measured envelope as the per-document tabulation
    // family on this corpus — same sketch, same slot count, different
    // grain. q_mh_tabulation's measured per-pair errors ARE that
    // envelope; the source-level errors must not exceed its max by more
    // than one slot quantum (1/NumHashes — the estimator is 20-slot
    // discretized, so grain alone can shift a max by one notch).
    //   measured (this commit, sf0.001): tabulation mean 0.041 max 0.233;
    //   source-level mean 0.033 max 0.139 — strictly inside.
    val tabErrs = SparkEntry.queries("q_mh_tabulation")(spark, sf).collect()
      .map(_.getDouble(5))
    val tabMean = tabErrs.sum / tabErrs.length
    val srcMean = mean
    info(f"tabulation mean $tabMean%.3f max ${tabErrs.max}%.3f; " +
      f"source-level mean $srcMean%.3f max ${errs.max}%.3f")
    assert(errs.max <= tabErrs.max + 1.0 / Dedup.NumHashes,
      s"source-level max ${errs.max} escapes the tabulation family's " +
      s"measured envelope (max ${tabErrs.max} + slot quantum) — the " +
      "merged sketch is NOT behaving as the union's tabulation sketch")
    assert(srcMean <= tabMean + 1.0 / Dedup.NumHashes,
      s"source-level mean $srcMean vs tabulation family mean $tabMean")
  }
}
