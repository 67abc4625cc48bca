package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Skew-mitigation utilities (SURVEY §7.3 "LA county dominates listings";
  * the 100 TB discipline items from the builder brief).
  *
  * - `saltedJoin`: for a fact⨝dim join whose key distribution is heavily
  *   skewed (one county holds a large share of rows), explode the dim side
  *   into `salt` replicas and spray the fact side uniformly across them —
  *   each hot key's rows spread over `salt` reducers instead of one.
  *   AQE's skew-join handles sort-merge skew automatically (enabled in our
  *   sessions); this explicit form covers the hash-partition aggregation
  *   path AQE doesn't split and documents the pattern.
  *
  * - `twoPhaseCount`: salted partial aggregation — groupBy(key, salt) then
  *   re-aggregate by key. (Spark's HashAggregate already does partial
  *   aggregation per partition; the explicit two-phase form matters when a
  *   single post-shuffle key still overflows one task, e.g. high-cardinality
  *   payloads per key.)
  */
object Skew {

  /** Left side (fact, skewed) joined to right side (bounded dim) with
    * `salt`-way replication of the dim. Result is row-identical to the
    * plain join (verified in SkewSpec). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(broadcast(saltedDim), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Oracle-checked salted join: events (fact; event_type has 5 values over
    * the whole table — the archetypal hot-key distribution) joined to a
    * self-derived per-type dimension through `saltedJoin`, then profiled.
    * The salt assignment is nondeterministic (hash of a physical row id)
    * but the joined ROW SET is identical to the plain join for every salt
    * assignment, so the decimal-sum profile is deterministic and the DuckDB
    * oracle states it with an ordinary unsalted join — the driver gate
    * verifies the equivalence the Scaladoc claims. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select("event_id", "event_type", "value")
    val dim = e.groupBy("event_type").agg(min("event_id").as("first_id"))
    saltedJoin(e, dim, "event_type", salt = 8)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        (sum(col("value").cast(DecimalType(18, 2))) * 100)
          .cast(LongType).as("sum_value_cents"),
        max(col("first_id")).as("first_id"))
      .orderBy("event_type")
  }

  /** Two-phase (salted) count per key: phase 1 reduces (key, salt) groups
    * in parallel; phase 2 merges the ≤`salt` partials per key. */
  def twoPhaseCount(df: DataFrame, key: Column, salt: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(salt)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("k")
      .agg(sum("partial").as("cnt"))
}
