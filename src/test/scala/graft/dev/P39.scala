package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-13 probe (VERDICT r12 item 4): WHERE do the bytes go in
  * q_dedup_ngram_jaccard / q_dedup_apply at sf10? The r12 gate showed
  * 3.6-5.2x/decade walls attributed to closure/shuffle; this captures
  * per-stage wall + shuffle read/write + spill via a listener so the
  * attribution is measured, not inferred. args: queries... (default
  * the two names), env P39_DIRS overrides the dir list.
  */
object P39 {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_ngram_jaccard", "q_dedup_apply")
    val dirs = sys.env.getOrElse("P39_DIRS", "/tmp/sf1,/tmp/sf10")
      .split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // P39_PARTS: initial shuffle-partition count A/B — AQE coalesces
    // DOWN from the initial number but never splits above it, so an
    // sf10 stage that spills at 32 partitions needs a higher INITIAL
    // count (the cluster-scale default), not a conf AQE can fix.
    val parts = sys.env.getOrElse("P39_PARTS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    final case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
      readMB: Double, writeMB: Double, spillMB: Double, recsIn: Long,
      recsOut: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId,
          i.name.takeWhile(_ != '\n').take(60),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten)
      }
    })

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    dirs.foreach { dir =>
      names.foreach { name =>
        stages.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // let straggler stage-completed events drain
        println(f"%n== $name @ $dir: wall $wall%.1f s, ${stages.size} stages ==")
        println(f"${"stage"}%-6s ${"wall_s"}%8s ${"cpu_s"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spill"}%8s ${"recR"}%10s ${"recW"}%10s  name")
        stages.sortBy(-_.taskMs).take(12).foreach { s =>
          println(f"${s.id}%-6d ${s.wallMs / 1e3}%8.2f ${s.taskMs / 1e3}%8.1f ${s.readMB}%8.1f ${s.writeMB}%8.1f ${s.spillMB}%8.1f ${s.recsIn}%10d ${s.recsOut}%10d  ${s.name}")
        }
        val totR = stages.map(_.readMB).sum
        val totW = stages.map(_.writeMB).sum
        val totSp = stages.map(_.spillMB).sum
        println(f"TOTAL shuffle read ${totR}%.0f MB, write ${totW}%.0f MB, spill ${totSp}%.0f MB")
        clearState()
      }
    }
    spark.stop()
  }
}
