package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins (builder brief: "repartition/bucketing
  * for co-located joins"; the 100 TB path for repeated fact⨝fact joins).
  *
  * Writing both sides bucketed by the join key (same bucket count) lets a
  * later sort-merge join read bucket-aligned files and skip BOTH shuffle
  * exchanges — on a 100 TB fact⨝fact join, the shuffle is usually the
  * entire cost, and it's paid once at write time instead of per query.
  * BucketingSpec asserts the joined plan contains no Exchange.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * the shuffles when bucket specs align. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
