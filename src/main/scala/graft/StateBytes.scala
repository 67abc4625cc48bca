package graft

/** Dev tool: state-store footprint of the streaming catalog queries —
  * the direct evidence behind "bounded state per query", which the
  * ShuffleBytes audit cannot see (state lives in the store, not the
  * shuffle). For each named query it clears the streaming run log, runs
  * the query's REAL AvailableNow execution, and prints one line per
  * streaming run the query launched: data micro-batches, and the MAX
  * across batches of total state rows / state memory bytes, straight
  * from StreamingQueryProgress.stateOperators. A stateless gate prints
  * 0/0 — that too is a measured claim.
  * Usage: sbt "runMain graft.StateBytes <sfDir> <query> [query...]" */
object StateBytes {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StateBytes <sfDir> <query...>")
    val sf = args(0)
    val spark = Tables.localSession("statebytes", 32)
    // Match the bench layout so the footprints read against BENCH/SCALE
    // numbers (Verify gates the default layout separately).
    spark.conf.set("graft.stream.shufflePartitions", "8")
    for (q <- args.drop(1)) {
      graft.streaming.Streaming.runStateLog = Nil
      SparkEntry.queries(q)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val runs = graft.streaming.Streaming.runStateLog
      if (runs.isEmpty)
        println(s"## $q runs=0 (no streaming execution)")
      for (r <- runs)
        println(s"## $q sink=${r.sink} batches=${r.dataBatches}" +
          s" max_state_rows=${r.maxStateRows}" +
          s" max_state_bytes=${r.maxStateBytes}")
    }
    spark.stop()
  }
}
