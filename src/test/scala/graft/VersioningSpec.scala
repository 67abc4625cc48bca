package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VersioningSpec extends AnyFunSuite {
  import TestSpark._

  test("merge upsert: profile totals match the planted edit script exactly") {
    val prof = SparkEntry.queries("q_merge_upsert")(spark, sf).collect()
    assert(prof.length <= 16)
    val d = Tables.documents(spark, sf)
    val nBase = d.count()
    val nDel = d.filter(col("doc_id") % 10 === 0).count()
    val nIns = d.filter(col("doc_id") % 9 === 0).count()
    val nUpd =
      d.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 0).count()
    // row count: base - deletes + inserts
    assert(prof.map(_.getLong(1)).sum === nBase - nDel + nIns)
    // total text length telescopes: -deleted lens +inserted copies' lens
    // +3 chars (" v2") per updated doc
    val lenBase = d.agg(sum(length(col("text")))).head().getLong(0)
    val lenDel = d.filter(col("doc_id") % 10 === 0)
      .agg(sum(length(col("text")))).head().getLong(0)
    val lenIns = d.filter(col("doc_id") % 9 === 0)
      .agg(sum(length(col("text")))).head().getLong(0)
    assert(prof.map(_.getLong(2)).sum ===
      lenBase - lenDel + lenIns + 3L * nUpd)
    // inserted id space is visible: some bucket's max_id is above 1M
    assert(prof.map(_.getLong(4)).max >= 1000000L)
  }
}
