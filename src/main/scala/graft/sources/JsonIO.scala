package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** JSONL source/sink — the de-facto interchange format of LLM training
  * corpora (one JSON document per line). Spark-first mirror of the CSV
  * surface (CsvIO / SURVEY §2.1): schema-DECLARED scans (never inference —
  * an inference pass over 100 TB is a full extra read, and inferred types
  * drift with the sample), DROPMALFORMED for corrupt lines (web-scale
  * crawl dumps always carry some), and line-splittable files so the scan
  * parallelizes exactly like CSV/parquet.
  */
object JsonIO {

  /** Schema-declared JSONL scan. DROPMALFORMED drops both unparsable
    * lines and lines whose values fail the declared types — the standard
    * ingest posture for crawl-scale corpora (count what you dropped via
    * rows-in minus rows-out on the ingest ledger, not by re-parsing). */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .json(path)

  /** JSONL sink; partitioned by default like every fact-sized sink. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Oracle-checked JSONL lifecycle: documents → JSONL sink → a planted
    * corrupt member file (broken syntax + type-mismatched values) →
    * DROPMALFORMED re-scan → profile. The oracle runs the same profile on
    * the ORIGINAL parquet, so the JSON text round-trip (escaping
    * included, via the text-length sum) must be lossless AND the corrupt
    * lines must be dropped exactly. */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val path = CsvIO.scratch("jsonl_roundtrip", dir)
    writeJsonl(src, path)
    // plant a corrupt member: one syntactically-broken line, one
    // type-mismatched line (valid JSON, doc_id not a number). Both kinds
    // must vanish under DROPMALFORMED. (Underscore-prefixed names are
    // skipped by the reader, so the plant uses a plain name.)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "zz_corrupt.json"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "truncated line...""",
        """{"doc_id": "not-a-number", "text": "typed wrong", "lang": "en",
          | "source": "x", "n_chars": 1}""".stripMargin.replace("\n", "")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    readJsonl(spark, path, schema)
      .agg(
        count(lit(1)).as("rows"),
        countDistinct(col("doc_id")).as("keys"),
        countDistinct(col("lang")).as("langs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast(LongType)).as("sum_text_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }
}
