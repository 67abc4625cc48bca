package graft

import graft.sources.JsonIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonIOSpec extends AnyFunSuite {
  import TestSpark._

  test("JSONL round-trip profile equals the source table exactly") {
    val src = Tables.documents(spark, sf)
    val out = SparkEntry.queries("q_jsonl_roundtrip")(spark, sf).collect()(0)
    assert(out.getAs[Long]("rows") === src.count())
    assert(out.getAs[Long]("sum_chars") ===
      src.agg(sum("n_chars")).collect()(0).getLong(0))
    assert(out.getAs[Long]("sum_text_chars") ===
      src.agg(sum(length(col("text")).cast("long"))).collect()(0).getLong(0))
  }

  test("DROPMALFORMED drops exactly the corrupt kinds, keeps null-padded rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_json_spec")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("data.json"),
      java.util.Arrays.asList(
        """{"k": 1, "s": "ok"}""",
        """{"k": 2}""", // missing field -> NULL, kept (not malformed)
        """{"k": "nope", "s": "typed wrong"}""", // type mismatch -> dropped
        """{"k": 3, "s": "ok" """, // broken syntax -> dropped
        """{"k": 4, "s": "last"}"""))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val got = JsonIO.readJsonl(spark, dir.toString, schema)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq === Seq((1L, "ok"), (2L, null), (4L, "last")))
  }
}
