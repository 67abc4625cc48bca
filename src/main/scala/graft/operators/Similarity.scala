package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder-brief first-class component).
  *
  * Two paths, as the brief prescribes:
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    bounded query set, one scan over the corpus, distributed two-stage
  *    top-k (per-(query, partition-salt) heads first, then the global k on
  *    the reduced set) so no single reducer sees n rows per query;
  *  - SRP-LSH (the scale path): signed-random-projection bit signatures,
  *    banded into buckets; candidates only WITHIN buckets, exact cosine on
  *    candidates. Hyperplanes are seeded literals (deterministic plans).
  *
  * Dot products use zip_with + aggregate — codegen'd built-ins, no UDF.
  */
object Similarity {

  val K = 10
  val QueryMod = 50 // vec_id % QueryMod == 0 → bounded query set

  /** Native codegen'd dot product (graft.functions.DotProduct via the
    * GraftExtensions-registered `vec_dot`) — a tight primitive loop inside
    * whole-stage codegen instead of the interpreted HOF path. */
  private def dot(a: String, b: String): Column =
    call_function("vec_dot", col(a), col(b))

  /** Embeddings with precomputed L2 norm (one narrow pass). */
  def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(dot("embedding", "embedding")))

  private def queries(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))

  /** Scored (query, candidate) pairs → cosine. */
  private def score(pairs: DataFrame): DataFrame =
    pairs.withColumn("cos",
      round(dot("q_emb", "embedding") / (col("q_norm") * col("norm")), 6))

  /** Brute-force exact top-k per query (baseline). */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val scored = score(e.crossJoin(broadcast(queries(e))))
      .filter(col("vec_id") =!= col("q_id"))
    // two-stage top-k: partial heads per (query, partition) first, so the
    // final per-query sort sees ≤ k·P rows, not n — the skew-proof idiom
    val partial = scored
      .withColumn("part", spark_partition_id())
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id", "part").orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rn") <= K)
      .drop("rn", "part")
    partial
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "rank")
  }

  // -- SRP-LSH -----------------------------------------------------------

  // 4 bands × 4 bits: for neighbor cosines ~0.4 (θ≈1.16), per-band collision
  // (1-θ/π)^4 ≈ 0.16 → recall ≈ 1-(1-0.16)^4 ≈ 0.5, with bucket fan-out
  // 2^4 per band keeping candidate sets ~4·n/16 per query
  val NumPlanes = 16
  val Bands = 4
  val BitsPerBand = NumPlanes / Bands

  /** Deterministic hyperplanes as a literal array<array<double>> column —
    * identical on every executor, no side channel. Components are
    * LCG-derived uniforms in [−0.5, 0.5): exact integer arithmetic and one
    * exact double division, so DuckDB regenerates bit-identical planes and
    * the whole SRP path (sign tests, band keys, candidates) is
    * SQL-replayable — which is what lets q_ann_lsh carry a full hash
    * oracle. Uniform-cube directions are not perfectly spherical, but the
    * SRP recall at these cosines is equivalent (recall-tested). */
  private[operators] def planeComponent(j: Int, d: Int): Double =
    (((j * 64L + d) * 2654435761L + 12345L) % 2147483648L).toDouble /
      2147483648.0 - 0.5
  private lazy val planesCol: Column =
    array((0 until NumPlanes).map { j =>
      array((0 until 64).map(d => lit(planeComponent(j, d))): _*)
    }: _*)

  /** Bit signature + band bucket keys per vector. */
  def signatures(e: DataFrame): DataFrame =
    e.withColumn("planes", planesCol)
      .withColumn("sig", expr(
        """transform(planes, p ->
          |  CASE WHEN vec_dot(p, embedding) >= 0
          |  THEN 1L ELSE 0L END)""".stripMargin))
      .withColumn("buckets", expr(
        s"""transform(sequence(0, $Bands - 1), b ->
           |  struct(b AS band,
           |         aggregate(slice(sig, b * $BitsPerBand + 1, $BitsPerBand),
           |                   0L, (acc, v) -> acc * 2 + v) AS key))"""
          .stripMargin))
      .drop("planes", "sig")

  /** Near-dup corpus: embeddings (widened to double) ∪ planted near copies
    * (vec_id%5==0, +1M ids, first element nudged by +0.05 → cos ≈ 0.9999).
    * The raw corpus is random gaussians with no true near-dups (pair cosines
    * top out ≈ 0.51), so the planted copies are what a dedup threshold of
    * 0.9 must find — and the construction is exactly reproducible in SQL,
    * so the exhaustive quadratic ground truth is the DuckDB oracle. */
  def nearDupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val planted = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1) + lit(0.05)),
          expr("slice(embedding, 2, 63)")).as("embedding"))
    e.unionByName(planted)
  }

  /** Embedding-cosine near-duplicate detection (brief dedup variant):
    * ALL-vector LSH bucketing (not just the query subset), pairs within
    * buckets, cosine ≥ threshold ⇒ near-dup pair. Same banded discipline as
    * MinHash — candidate volume is Σ bucket², never n². At cos ≈ 0.9999 the
    * per-pair SRP miss probability is (θ/π)^4·bands ≈ 1e-7, so the banded
    * output equals the exhaustive ground truth (oracle-verified). */
  def cosineNearDup(spark: SparkSession, dir: String,
                    threshold: Double = 0.9): DataFrame = {
    val e = signatures(withNorm(nearDupCorpus(spark, dir)))
    val flat = e.select(col("vec_id"), col("embedding"), col("norm"),
      explode(col("buckets")).as("bk"))
      .select(col("vec_id"), col("embedding"), col("norm"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = flat.select(col("band"), col("key"), col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val b = flat.select(col("band"), col("key"), col("vec_id"),
      col("embedding"), col("norm"))
    score(a.join(b, Seq("band", "key")).filter(col("q_id") < col("vec_id")))
      .filter(col("cos") >= threshold)
      .select(col("q_id").as("a"), col("vec_id").as("b"), col("cos"))
      .distinct()
      .orderBy("a", "b")
  }

  // -- IVF -------------------------------------------------------------

  val NumLists = 16
  val NumProbes = 4

  /** Coarse k-means quantizer as plain DataFrame aggregation, built to be
    * BIT-DETERMINISTIC so DuckDB can replay it (q_ann_ivf's oracle unrolls
    * these rounds in SQL):
    *  - init: the k sample vectors with the lowest LCG key hash
    *    (exact integer arithmetic — no engine-specific hash);
    *  - assignment: codegen'd `vec_dot` argmin, first-minimum tie-break;
    *  - update: per list, members are folded in vec_id order (sorted
    *    collect, left fold, one division) — canonical-order double sums,
    *    identical on any partitioning, instead of a partition-order `avg`.
    * Each round collects k·dim doubles — bounded, independent of corpus
    * size. A coarse quantizer doesn't need convergence, and it never
    * trains on the full corpus at scale — a deterministic key-derived
    * sample is what a 100 TB IVF build clusters, which is also why the
    * canonical-order fold (a sort of the bounded sample per round) is
    * affordable. */
  private[operators] def kmeansCentroids(sample: DataFrame, k: Int,
                                         iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = sample
      .withColumn("h", // key reduced mod 2³¹ first: no Long overflow at
        // any vec_id (congruence: (k·c) mod m ≡ ((k mod m)·c) mod m)
        pmod(pmod(col("vec_id"), lit(2147483648L)) * 2654435761L + 99L,
          lit(2147483648L)))
      .orderBy("h", "vec_id").limit(k)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val centsCol = array(cents.map(c => array(c.map(lit): _*)): _*)
      val sums = sample
        .withColumn("cents", centsCol)
        .withColumn("list_id", expr(
          """array_position(
            |  transform(cents, c -> vec_dot(c, c) - 2.0D * vec_dot(c, embedding)),
            |  array_min(transform(cents,
            |    c -> vec_dot(c, c) - 2.0D * vec_dot(c, embedding))))"""
            .stripMargin))
        .groupBy("list_id")
        .agg(sort_array(collect_list(struct(col("vec_id").as("vid"),
          col("embedding").cast(ArrayType(DoubleType)).as("emb")))).as("ms"))
        .select(col("list_id"),
          expr("""aggregate(slice(ms, 2, size(ms)), element_at(ms, 1).emb,
                 |  (acc, m) -> zip_with(acc, m.emb, (a, b) -> a + b))"""
            .stripMargin).as("sumv"),
          size(col("ms")).as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty lists keep their centroid
      sums.foreach { r =>
        val n = r.getInt(2)
        next(r.getLong(0).toInt - 1) =
          r.getSeq[Double](1).map(_ / n).toArray
      }
      cents = next
    }
    cents
  }

  /** IVF ANN: a k-means coarse quantizer assigns every vector to its
    * nearest centroid list; a query probes only the `NumProbes` nearest
    * lists and scores those candidates exactly. The centroids are trained
    * once (seeded, on a 25% key-derived sample) and shipped as plan
    * literals — the inverted-file structure is just a groupBy key, so the
    * search is one bucketed join, the same shuffle discipline as the LSH
    * path but data-adaptive. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint, not cache: reused by every Lloyd round AND the
    // final search, but a cache would stay pinned in the CacheManager for
    // the JVM's lifetime (no post-materialization hook to unpersist from);
    // checkpoint blocks are GC-scoped — released once the result frame
    // is dropped (durable `checkpoint` on a real cluster)
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(true)
    val centroids = kmeansCentroids(
      e.filter(col("vec_id") % 4 === 0).select("vec_id", "embedding"),
      NumLists, iters = 3)
    // centroids → one literal array<array<double>> column
    val cents = array(centroids.map(c => array(c.map(lit): _*)): _*)
    // squared distance to centroid c: x·x − 2x·c + c·c; x·x is constant
    // per row for the argmin, so rank by (c·c − 2x·c)
    val withDists = e.withColumn("cents", cents)
      .withColumn("dists", expr(
        "transform(cents, c -> vec_dot(c, c) - 2.0D * vec_dot(c, embedding))"))
    val assigned = withDists
      .withColumn("list_id",
        expr("array_position(dists, array_min(dists))").cast(LongType))
      .drop("cents", "dists")
    val probed = withDists
      .filter(col("vec_id") % QueryMod === 0)
      .withColumn("probe", explode(expr(
        s"""slice(array_sort(zip_with(dists, sequence(1, $NumLists),
           |  (d, i) -> struct(d AS d, i AS i))), 1, $NumProbes)"""
          .stripMargin)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("probe.i").cast(LongType).as("list_id"))
    val pairs = assigned.join(broadcast(probed), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "q_norm", "vec_id", "embedding", "norm")
      .distinct()
    score(pairs)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "rank")
  }

  /** LSH ANN: bucket-join queries to candidates, exact cosine on the
    * candidate set only, top-k. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = signatures(withNorm(Tables.embeddings(spark, dir)))
    val cand = e.select(col("vec_id"), col("embedding"), col("norm"),
      explode(col("buckets")).as("bk"))
      .select(col("vec_id"), col("embedding"), col("norm"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val qs = cand.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("band"), col("key"))
    val pairs = cand.join(broadcast(qs), Seq("band", "key"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "q_norm", "vec_id", "embedding", "norm")
      .distinct()
    score(pairs)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "rank")
  }
}
