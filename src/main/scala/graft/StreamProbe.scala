package graft

/** Dev tool (r20, VERDICT item 6): micro-batch wall-clock breakdown for
  * the streaming catalog queries — attributes each run's time to state
  * commit vs compute vs offset-log constants, straight from
  * StreamingQueryProgress. For each named query it runs the REAL
  * AvailableNow execution (bench layout: 8 state-store partitions) and
  * prints, summed across micro-batches: triggerExecution (total), the
  * addBatch slice (plan+execute+commit the sink), the offset-log
  * constants (latestOffset/walCommit/commitOffsets/queryPlanning), and
  * the state-store operator totals (commit/update/removal/rebalance
  * times). The residual between triggerExecution and its parts is
  * scheduling glue. Usage:
  *   sbt "runMain graft.StreamProbe <sfDir> <query> [query...]" */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProbe <sfDir> <query...>")
    val sf = args(0)
    val spark = Tables.localSession("streamprobe", 32)
    spark.conf.set("graft.stream.shufflePartitions", "8")
    // optional provider experiment (VERDICT item 6): GRAFT_PROBE_ROCKSDB=1
    // swaps in the RocksDB state store (+changelog checkpointing) so the
    // commit-constant hypothesis can be tested, not assumed
    if (sys.env.contains("GRAFT_PROBE_ROCKSDB")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", "true")
      println("## provider=RocksDB (changelog checkpointing on)")
    }
    for (q <- args.drop(1)) {
      graft.streaming.Streaming.lastRunProgressJson = Nil
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = graft.streaming.Streaming.lastRunProgressJson
      if (progs.isEmpty) { println(s"## $q runs=0 (no streaming progress)") }
      else {
        // durationMs keys, summed across batches (values are millis)
        val durKeys = Seq("triggerExecution", "addBatch", "latestOffset",
          "walCommit", "commitOffsets", "queryPlanning", "getBatch")
        def sumKey(k: String): Long = progs.map { j =>
          s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(j)
            .map(_.group(1).toLong).getOrElse(0L)
        }.sum
        // stateOperators customMetrics / times (first occurrence per batch)
        def sumAll(k: String): Long = progs.map { j =>
          s""""$k"\\s*:\\s*(\\d+)""".r.findAllMatchIn(j)
            .map(_.group(1).toLong).sum
        }.sum
        val parts = durKeys.map(k => s"$k=${sumKey(k)}ms").mkString(" ")
        println(f"## $q batches=${progs.size} wall=$wall%.2fs $parts " +
          s"state[commitTimeTotal=${sumAll("commitTimeMs")}ms " +
          s"updateTimeTotal=${sumAll("allUpdatesTimeMs")}ms " +
          s"removalTimeTotal=${sumAll("allRemovalsTimeMs")}ms]")
      }
    }
    spark.stop()
  }
}
