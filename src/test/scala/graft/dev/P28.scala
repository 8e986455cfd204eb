package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-11 probe: the two queued streaming-six dials now that the
  * scratch moved to tmpfs (DEVLOG r10 item 1).
  *
  * (a) RocksDB state-store provider A/B on the four engine-state
  *     parities (wmdedup / ssj / sess / win) — expected to LOSE at
  *     tiny state (native lib init + SST churn per trigger vs an
  *     in-heap HashMap), recorded either way.
  * (b) State-partition curve re-sweep {1,2,4,8} via the
  *     graft.stream.statePartitions prop — the old 8-vs-4 A/Bs predate
  *     cheap (tmpfs) fsyncs; per-partition store open/commit cost
  *     collapsed, so the optimum may have moved.
  *
  * Interleaved A/B/A/B per query (medians of 3) — this host steals CPU,
  * absolute numbers are meaningless across sessions.
  * args: sfDir [provider|sweep] — default runs both; "sweep" reruns the
  * partition curve alone with 5 passes (the confirm run).
  */
object P28 {
  private val StatefulFour = Seq(
    "q_stream_watermark_dedup", "q_stream_stream_join",
    "q_stream_session_parity", "q_stream_window_parity")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
    val HdfsProvider =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val RocksProvider =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clear()
      dt
    }
    def median3(name: String): Double =
      (1 to 3).map(_ => runOnce(name)).sorted.apply(1)

    val mode = args.drop(1).headOption.getOrElse("both")
    val passes = if (mode == "sweep") 5 else 3

    if (mode != "sweep") {
    println("== (a) provider A/B, interleaved, medians of 3 ==")
    StatefulFour.foreach { name =>
      runOnce(name) // warm
      val hdfs = collection.mutable.ArrayBuffer[Double]()
      val rocks = collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        spark.conf.set(ProviderKey, HdfsProvider)
        hdfs += runOnce(name)
        spark.conf.set(ProviderKey, RocksProvider)
        rocks += runOnce(name)
      }
      spark.conf.set(ProviderKey, HdfsProvider)
      println(f"$name%-26s hdfs ${hdfs.sorted.apply(1)}%6.2f s   rocksdb ${rocks.sorted.apply(1)}%6.2f s")
    }
    }

    println(s"== (b) state-partition sweep, interleaved, medians of $passes ==")
    val sweeps = Seq(1, 2, 4, 8)
    // finally-guarded: a failure mid-sweep must not leave the override
    // set — withStatePartitions reads it in the PRODUCTION path, so a
    // leaked prop would silently re-partition every later stream query
    // in this JVM (round-11 ADVICE).
    try {
      StatefulFour.foreach { name =>
        runOnce(name) // warm
        val acc = sweeps.map(_ => collection.mutable.ArrayBuffer[Double]())
        (1 to passes).foreach { _ =>
          sweeps.zipWithIndex.foreach { case (n, i) =>
            sys.props("graft.stream.statePartitions") = n.toString
            acc(i) += runOnce(name)
          }
        }
        val cells = sweeps.zip(acc).map { case (n, ts) =>
          f"p$n%-2d ${ts.sorted.apply(passes / 2)}%5.2f" }.mkString("   ")
        println(f"$name%-26s $cells")
      }
    } finally sys.props.remove("graft.stream.statePartitions")
    spark.stop()
  }
}
