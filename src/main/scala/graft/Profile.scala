package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Dev tool: stage-by-stage wall-clock decomposition of the expensive
  * queries, so optimization targets the stage that actually costs time.
  * Usage: sbt "runMain graft.Profile [sfDir]" */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile", 32)
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"## $n%-28s ${(System.nanoTime - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm-up
    time("corpus count")(Dedup.corpus(spark, sf).count())
    time("sigs")(Dedup.signatures(Dedup.corpus(spark, sf)).count())
    time("candidatePairs")(
      Dedup.candidatePairs(Dedup.signatures(Dedup.corpus(spark, sf))).count())
    time("minhashNearDup")(Dedup.minhashNearDup(spark, sf).count())
    time("survivors")(Dedup.dedupSurvivors(spark, sf).count())
    time("simhash sigs")(Dedup.simhash(Dedup.corpus(spark, sf)).count())
    time("simhashNearDup")(Dedup.simhashNearDup(spark, sf).count())
    // rolling_fp codegen kernel vs the interpreted HOF fold it replaced
    // (r7): same arithmetic, sum-reduced so only the fold cost is timed
    val docs = Tables.documents(spark, sf).select("text")
    docs.persist().count()
    for (i <- 1 to 3) {
      time(s"fp HOF fold #$i")(docs.selectExpr(
        """sum(aggregate(split(text, ''), 0L,
          |  (acc, c) -> (acc * 131 + ascii(c)) % 1000000007))"""
          .stripMargin).collect())
      time(s"fp rolling_fp #$i")(
        docs.selectExpr("sum(rolling_fp(text))").collect())
    }
    docs.unpersist()
    spark.stop()
  }
}
