package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** String / date scalar-function surface (SURVEY.md §2.8: F1–F6, F9–F10).
  *
  * Mirrors the reference's hp/RPM extraction from `power` strings like
  * "252 hp @ 5,600 RPM" (02_DataCleaning.R:149-182): split → first token →
  * numeric; null-safe 4th token → comma strip → numeric. The testdata has no
  * such column, so the power string is synthesized deterministically from
  * part columns with three shapes (full / short / unparseable) keyed on
  * `p_partkey % 3`, so every extraction branch (present, missing-token,
  * failed-cast) is exercised and oracle-checked.
  *
  * ANSI-mode discipline (Spark 4 default): `try_element_at` for the
  * out-of-bounds token (plain `element_at` throws), `try_cast` for the
  * null-on-fail numeric parse (plain cast throws) — these match R's
  * tryCatch/as.numeric semantics AND DuckDB's list_extract/TRY_CAST.
  */
object Strings {

  /** The synthetic power column: "<hp> hp @ <r,pm> RPM" | "<hp> hp" | "N/A". */
  private def withPowerStr(df: DataFrame): DataFrame =
    df.withColumn("power_str",
      when(col("p_partkey") % 3 === 0,
        concat(
          (col("p_size") * 10).cast(StringType), lit(" hp @ "),
          format_number(lit(1000) + (col("p_partkey") % 50) * 100, 0),
          lit(" RPM")))
      .when(col("p_partkey") % 3 === 1,
        concat((col("p_size") * 10).cast(StringType), lit(" hp")))
      .otherwise(lit("N/A")))

  /** F1+F2+F3+F4+F5+F10: composite string-extraction projection. */
  def stringExtract(spark: SparkSession, dir: String): DataFrame = {
    val p = withPowerStr(Tables.part(spark, dir))
    p.select(
      col("p_partkey"),
      col("power_str"),
      // F2+F5: first token → double (null on parse failure, like as.numeric)
      expr("try_cast(split(power_str, ' ')[0] AS DOUBLE)").as("hp"),
      // F3+F4+F5: null-safe 4th token → strip thousands comma → double
      expr("try_cast(regexp_replace(try_element_at(split(power_str, ' '), 4)," +
        " ',', '') AS DOUBLE)").as("rpm"),
      // F1+F10: lower + concat key normalization
      lower(concat(col("p_brand"), lit(":"),
        split(col("p_name"), " ").getItem(0))).as("label"))
  }

  /** F6: to_date round-trip + date comparison (reference
    * 02_DataCleaning.R:122-139): format → parse → predicate. F9: round. */
  def dateParse(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("date_str", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("parsed", to_date(col("date_str"), "yyyy-MM-dd"))
      .filter(col("parsed") > lit("2000-06-15").cast(DateType))
      .agg(
        count(lit(1)).as("cnt"),
        min("parsed").as("min_d"),
        max("parsed").as("max_d"),
        // mean from the exact decimal sum (one double division, then round):
        // AVG over raw doubles depends on partition summation order
        round(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType) / count(lit(1)), 4).as("avg_price"))

  /** Edit-distance similarity self-join over the part-name DICTIONARY —
    * the entity-resolution primitive ("red bolt" ≈ "old bolt") the
    * reference performs by hand when it harmonizes factor levels
    * (02_DataCleaning.R:200-231). Semantics: all unordered pairs of
    * distinct names with levenshtein ≤ [[EditJoinMaxDist]].
    *
    * Scale shape — dictionary-then-band, never row-pairs: `distinct`
    * collapses the fact table to its value dictionary first (at 100 TB the
    * dictionary of a categorical attribute is thousands of values, and the
    * collapse is a map-side-combinable hash agg over the one name column).
    * Candidates then come from an EQUI-join on exact string length: since
    * d edits change length by ≤ d, the longer name probes each length in
    * [len−d, len] and meets the shorter side's exact length — the same
    * derived-equi-key discipline as the LSH bands / geo grid / range-join
    * buckets, so Spark plans a hash join, not a cartesian product. The
    * exact levenshtein verify runs only on banded candidates. Pair
    * uniqueness is by construction: the longer side alone probes downward
    * (an equal-length pair is kept once via name_a < name_b). */
  private[graft] val EditJoinMaxDist = 2

  def editJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
      .select(col("p_name").as("name"), length(col("p_name")).as("len"))
    val probes = names
      .select(col("name").as("name_l"), col("len").as("len_l"),
        explode(sequence(col("len") - EditJoinMaxDist, col("len")))
          .as("probe_len"))
    probes.join(names.select(col("name").as("name_r"), col("len").as("len_r")),
        col("probe_len") === col("len_r"))
      // longer-probes-shorter keeps each unordered pair once; lexicographic
      // tie-break on equal length
      .filter(col("len_l") > col("len_r") ||
        (col("len_l") === col("len_r") && col("name_l") < col("name_r")))
      .filter(levenshtein(col("name_l"), col("name_r")) <= EditJoinMaxDist)
      .select(least(col("name_l"), col("name_r")).as("name_a"),
        greatest(col("name_l"), col("name_r")).as("name_b"),
        levenshtein(col("name_l"), col("name_r")).cast(LongType).as("dist"))
      .orderBy("name_a", "name_b")
  }

  /** DuckDB replay of [[editJoin]]: the banding is result-exact (every
    * pair within the length window is produced), so the oracle states the
    * SEMANTIC form — the length-window predicate plus the same
    * levenshtein gate — not the execution banding. */
  def editJoinOracleSql: String =
    s"""WITH n AS (SELECT DISTINCT p_name FROM part)
       |SELECT least(a.p_name, b.p_name) AS name_a,
       |  greatest(a.p_name, b.p_name) AS name_b,
       |  levenshtein(a.p_name, b.p_name) AS dist
       |FROM n a JOIN n b
       |  ON a.p_name < b.p_name
       |  AND abs(length(a.p_name) - length(b.p_name)) <= $EditJoinMaxDist
       |WHERE levenshtein(a.p_name, b.p_name) <= $EditJoinMaxDist
       |ORDER BY name_a, name_b""".stripMargin
}
