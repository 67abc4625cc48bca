package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("zKey interleave puts x bits at odd, y bits at even positions") {
    val row = spark.range(1)
      .select(Layout.zKey(lit(3L), lit(1L)).as("z"),
        Layout.zKey(lit(0L), lit(65535L)).as("zy"),
        Layout.zKey(lit(65535L), lit(0L)).as("zx"))
      .head()
    // x=0b11 -> bits 1,3; y=0b01 -> bit 0 => 0b1011 = 11
    assert(row.getLong(0) === 11L)
    // pure-y key is the even-bit mask, pure-x the odd-bit mask
    assert(row.getLong(1) === 0x55555555L)
    assert(row.getLong(2) === 0xAAAAAAAAL)
  }

  test("z-order zone map: shards bound BOTH dimensions to 12-bit spans") {
    val rows = SparkEntry.queries("q_zorder")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= (1 << Layout.ShardBits))
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === n)
    // a shard fixes the top ShardBits/2 = 4 bits of each quantized dim,
    // so per-shard spans can never exceed 2^12-1 in EITHER dimension —
    // the zone-map tightness data skipping relies on (a linear sort on x
    // alone would leave y spans at the full 16-bit width)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 4095L, s"x span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 4095L, s"y span too wide: $r")
    }
  }
}
