package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * technique behind data skipping on more than one column.
  *
  * A 100 TB table sorted linearly on one column prunes scans on THAT
  * column only; predicates on a second column read everything. Writing
  * files in Z-order — rows sorted by the bit-interleave of two quantized
  * dimensions — keeps each file's min/max zone map tight on BOTH columns
  * at once, so either-dimension predicates prune files (this is what
  * `OPTIMIZE ... ZORDER BY` does in lakehouse table formats). The operator
  * here computes the Z-key and emits the per-shard zone map itself
  * (count + min/max of both dimensions per fixed-width Z-range), i.e. the
  * statistics a layout job would write next to the files.
  *
  * Everything is exact integer arithmetic — quantization is
  * `(v-min)*65535 div (max-min)`, the interleave is shifts and ors — so
  * the result is bit-identical at any parallelism and fully replayable in
  * the DuckDB oracle (the 32-term interleave expression is generated from
  * the same constants, [[zOrderOracleSql]]).
  *
  * Scale shape: one bounded min/max scalar pass (4 values to the driver,
  * same discipline as [[Graph.pageRank]]'s max(id)), then one narrow
  * projection and one ≤2^ShardBits-group aggregate. No joins; at 100 TB
  * the real layout job would add a range-partitioned sort by `z` — a
  * single total-order shuffle, the same cost class as any global sort.
  *
  * (Reference analogue: none — the reference stores `ff` chunks in load
  * order, 01_DataMerge.R:42-47; layout optimization is brief-side
  * completeness for the scan-pruning story at scale.)
  */
object Layout {

  /** Bits per quantized dimension (16 → the Z-key spans 32 bits). */
  val ZBits = 16

  /** Top Z-key bits that name a shard (8 → ≤256 zone-map rows). */
  val ShardBits = 8

  private def bitAt(c: Column, i: Int): Column =
    shiftrightunsigned(c, i).bitwiseAND(lit(1L))

  /** Morton interleave of two ZBits-wide non-negative longs: x's bit i
    * lands at position 2i+1, y's at 2i. */
  def zKey(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(bitAt(x, i), 2 * i + 1)
        .bitwiseOR(shiftleft(bitAt(y, i), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Zone map of `events` Z-ordered on (user_id, event time): per Z-range
    * shard, the row count and min/max of both quantized dimensions. */
  def zOrderLayout(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("x"), unix_micros(col("ts")).as("y"))
    // bounded scalar pass: 4 longs to the driver (quantization bounds,
    // embedded as literals so plan and oracle share the same constants)
    val b = ev.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (mnx, mxx, mny, mxy) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val sx = math.max(mxx - mnx, 1L)
    val sy = math.max(mxy - mny, 1L)
    // the ×65535 products run in DECIMAL(38,0): (y - mny) is epoch-micros
    // offset, and Long arithmetic would wrap once the time range exceeds
    // ~4.5 years ((2^63 - 1) / 65535 µs) — the oracle widens to HUGEINT at
    // the same spot, so both engines stay exact at any range (div on
    // decimals is IntegralDivide → the quantized values land back in Long)
    ev.select(
        expr(s"cast(x - $mnx as decimal(38,0)) * 65535 div $sx").as("xq"),
        expr(s"cast(y - $mny as decimal(38,0)) * 65535 div $sy").as("yq"))
      .withColumn("shard",
        shiftrightunsigned(zKey(col("xq"), col("yq")), 2 * ZBits - ShardBits))
      .groupBy("shard")
      .agg(count(lit(1)).as("n"),
        min("xq").as("min_x"), max("xq").as("max_x"),
        min("yq").as("min_y"), max("yq").as("max_y"))
      .orderBy("shard")
  }

  /** DuckDB replay of [[zOrderLayout]]: same quantization (from a CTE
    * min/max instead of embedded literals — numerically identical) and a
    * generated 32-term interleave so the bit layout can never drift. */
  def zOrderOracleSql: String = {
    def terms(cn: String, off: Int): String =
      (0 until ZBits).map(i => s"((($cn >> $i) & 1) << ${2 * i + off})")
        .mkString(" | ")
    s"""WITH ev AS (SELECT user_id AS x, epoch_us(ts) AS y FROM events),
       |b AS (SELECT MIN(x) AS mnx, MAX(x) AS mxx,
       |             MIN(y) AS mny, MAX(y) AS mxy FROM ev),
       |q AS (SELECT CAST((CAST(x - mnx AS HUGEINT) * 65535)
       |               // GREATEST(mxx - mnx, 1) AS BIGINT) AS xq,
       |             CAST((CAST(y - mny AS HUGEINT) * 65535)
       |               // GREATEST(mxy - mny, 1) AS BIGINT) AS yq
       |      FROM ev, b),
       |z AS (SELECT xq, yq,
       |             (${terms("xq", 1)}) | (${terms("yq", 0)}) AS zk
       |      FROM q)
       |SELECT zk >> ${2 * ZBits - ShardBits} AS shard,
       |  COUNT(*) AS n,
       |  MIN(xq) AS min_x, MAX(xq) AS max_x,
       |  MIN(yq) AS min_y, MAX(yq) AS max_y
       |FROM z GROUP BY 1 ORDER BY shard""".stripMargin
  }
}
