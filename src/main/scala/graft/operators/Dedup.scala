package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Deduplication operators for LLM training-data pipelines over `documents`
  * (builder-brief first-class components; SURVEY.md §7.1(7)).
  *
  * - exact dedup: content-hash groupBy (md5 — DuckDB-oracle-checkable)
  * - near dedup: word-shingle MinHash, BANDED into LSH buckets; candidate
  *   pairs are generated only WITHIN buckets (groupBy/self-join on the band
  *   key — never all-pairs), then verified with exact Jaccard
  * - SimHash: 64-bit signed bit-vote fingerprint, banded into 16-bit chunks
  *   for candidate generation, Hamming-verified
  *
  * Scale design (100 TB): all stages are narrow maps + hash shuffles keyed
  * on (band, signature); cost is O(n·bands + Σ bucket²) with a bucket-size
  * cap dropping degenerate buckets (boilerplate text at web scale),
  * the standard guard against quadratic blowup on skewed buckets. Signatures
  * are built with codegen'd built-ins (xxhash64/transform/aggregate), no
  * UDFs.
  *
  * The testdata corpus is random words (no natural dups), so `corpus` plants
  * deterministic exact (+1M ids) and near (+2M ids, 2 appended tokens)
  * duplicates — every branch is exercised and unit-tested.
  */
object Dedup {

  /** documents ∪ planted exact dups (doc_id%5==0) ∪ planted near dups
    * (doc_id%7==0, two tokens appended). */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val exact = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" qq zz")).as("text"))
    d.unionByName(exact).unionByName(near)
  }

  /** Exact dedup: md5 content hash → group → keep-first (min doc_id).
    * Emits only the duplicate groups (bounded output). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
      .filter(col("cnt") > 1)
      .orderBy("h")

  // -- MinHash-LSH -------------------------------------------------------

  val NumHashes = 20
  val Bands = 5
  val RowsPerBand = NumHashes / Bands
  val MaxBucket = 100 // drop degenerate buckets (boilerplate at web scale)

  /** doc_id, shingles (distinct word 3-grams), minhash signature array. */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens",
        split(regexp_replace(lower(col("text")), "\\s+", " "), " "))
      .withColumn("shingles", expr(
        """array_distinct(CASE WHEN size(tokens) < 3
          |  THEN array(concat_ws(' ', tokens))
          |  ELSE transform(sequence(0, size(tokens) - 3),
          |                 i -> concat_ws(' ', slice(tokens, i + 1, 3)))
          |END)""".stripMargin))
      .withColumn("minhash", expr(
        s"""transform(sequence(0, $NumHashes - 1),
           |  j -> array_min(transform(shingles, s -> xxhash64(s, j))))"""
          .stripMargin))
      .select("doc_id", "shingles", "minhash")

  /** Candidate pairs via banded LSH: explode (band, band-signature) keys,
    * self-join within buckets only, cap bucket size. */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val exploded = sigs.select(
      col("doc_id"),
      explode(expr(
        s"""transform(sequence(0, $Bands - 1),
           |  b -> struct(b AS band,
           |              xxhash64(slice(minhash, b * $RowsPerBand + 1,
           |                             $RowsPerBand), b) AS sig))"""
          .stripMargin)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val bucketed = exploded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "sig")))
      .filter(col("bucket_n") <= MaxBucket)
    val a = bucketed.select(col("band"), col("sig"), col("doc_id").as("a"))
    val b = bucketed.select(col("band"), col("sig"), col("doc_id").as("b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** n-gram (3-shingle) Jaccard over the planted near-dup pairs — the
    * verification metric as its own oracle-checked operator. Each original
    * joins its planted +2M near copy on the derived key: one narrow join,
    * no candidate explosion (candidate GENERATION is minhash/simhash's
    * job; this is the exact-similarity kernel they share). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = signatures(corpus(spark, dir)).select("doc_id", "shingles")
    val orig = sh.filter(col("doc_id") < 1000000 && col("doc_id") % 7 === 0)
      .select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val near = sh.filter(col("doc_id") >= 2000000)
      .select(col("doc_id").as("b"), (col("doc_id") - 2000000).as("k"),
        col("shingles").as("sh_b"))
    orig.join(near, orig("a") === near("k"))
      .select(col("a"), col("b"), round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType),
        6).as("jaccard"))
      .orderBy("a")
  }

  /** Near-dedup end to end: candidates → exact-Jaccard verification. */
  def minhashNearDup(spark: SparkSession, dir: String,
                     threshold: Double = 0.5): DataFrame = {
    val sigs = signatures(corpus(spark, dir)).cache()
    val pairs = candidatePairs(sigs)
    val sa = sigs.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  // -- Survivor selection (connected components) --------------------------

  /** Connected components over an undirected pair set by iterative
    * min-label propagation (the DataFrame form of the large-star/small-star
    * pattern): every node starts labeled with itself; each round a node
    * takes the minimum label among itself and its neighbors; fixpoint in
    * O(component diameter) rounds. Each round is one shuffle join + one
    * grouped min — no driver-side graph, no GraphX/RDD detour — so the same
    * loop runs on a web-scale pair set. The convergence probe is an
    * `isEmpty` on the changed-label frame (a metadata-cheap limit-1 scan),
    * and `maxIter` bounds the worst case. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .cache()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).cache()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val prop = edges.join(labels, edges("b") === labels("node"))
        .select(edges("a").as("node"), col("label"))
      val next = labels.select("node", "label").unionByName(prop)
        .groupBy("node").agg(min("label").as("label"))
        .cache()
      done = next.withColumnRenamed("label", "new_label")
        .join(labels, "node")
        .filter(col("new_label") < col("label"))
        .isEmpty
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Survivor selection — the step after candidate generation + verification
    * in a real dedup pipeline: near-dup pairs → connected components →
    * keep-first (min doc_id) per duplicate group. Emits one row per group
    * with its survivor, size, and largest member (bounded output). */
  def dedupSurvivors(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(minhashNearDup(spark, dir))
      .groupBy(col("label").as("survivor_id"))
      .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_member"))
      .orderBy("survivor_id")

  // -- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over the token multiset (bit-vote of per-token hashes).
    *
    * Token hashes are two polynomial char rolls mod 2^31-range primes
    * (h1 bases bits 0–31, h2 bits 32–63) instead of xxhash64: every
    * intermediate stays below 2^63, so DuckDB's overflow-checked BIGINT
    * arithmetic reproduces the full signature — banding, Hamming filter and
    * all — making the operator exactly oracle-checkable. (Bits 31/63 are
    * constant under the < 2^31 moduli; 62 effective vote bits.)
    *
    * Written as ONE nested expression where every subexpression is
    * referenced exactly once: per-token bit votes accumulate into a
    * 64-long array in a single pass (zip_with against the running array),
    * then the sign vector packs into the long. Splitting this into
    * `bits`/`pack` columns looks cleaner but is a performance trap —
    * CollapseProject inlines the column into every element_at reference
    * and the 64-way pack re-evaluates the full token aggregation 64×
    * (measured: 384 s → 4 s at sf0.1). */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .withColumn("simhash", expr(
        """aggregate(
          |  zip_with(
          |    aggregate(
          |      transform(split(regexp_replace(lower(text), '\\s+', ' '), ' '),
          |        t -> aggregate(split(t, ''), struct(0L AS h1, 0L AS h2),
          |          (a, c) -> struct(
          |            (a.h1 * 131 + ascii(c)) % 2147483647 AS h1,
          |            (a.h2 * 137 + ascii(c)) % 2147483629 AS h2))),
          |      array_repeat(0L, 64),
          |      (acc, h) -> zip_with(acc, sequence(0, 63), (a, b) ->
          |        a + CASE WHEN ((CASE WHEN b < 32 THEN shiftright(h.h1, b)
          |                        ELSE shiftright(h.h2, b - 32) END) & 1) = 1
          |            THEN 1 ELSE -1 END)),
          |    sequence(0, 63),
          |    (v, b) -> shiftleft(CASE WHEN v >= 0 THEN 1L ELSE 0L END, b)),
          |  0L, (acc, x) -> acc + x)""".stripMargin))
      .select("doc_id", "simhash")

  /** SimHash near-dup pairs: 16-bit chunk banding → Hamming ≤ maxDist. */
  def simhashNearDup(spark: SparkSession, dir: String,
                     maxDist: Int = 10): DataFrame = {
    val sh = simhash(corpus(spark, dir)).cache()
    val chunks = sh.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
          |  c -> struct(c AS chunk,
          |              shiftright(simhash, c * 16) & 65535 AS key))"""
          .stripMargin)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(expr("sim_a ^ sim_b")).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy("a", "b")
  }
}
