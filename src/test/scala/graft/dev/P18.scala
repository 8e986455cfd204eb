package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate-scale mega-class probe (VERDICT r7 item 6 / r8 item 5):
  * DedupGuardSpec proves the ClassGuard star path on a 30-doc
  * fixture; this proves it at volume. Fixture: /tmp/megaprobe =
  * sf1 documents (50k organic docs) + 100k IDENTICAL boilerplate
  * docs — one class 24x over the default 4096 cap, the degenerate
  * shape an unguarded roster would turn into a single-row 100k
  * array and a 10^10-pair intra expansion (simhash).
  *
  * Measures, for guarded jaccard + simhash on the mega fixture and
  * (reference) plain sf1: wall seconds, output rows, and per-task
  * duration distribution (median + max across ALL tasks of the run)
  * — the no-straggler evidence: max task must stay within ~10x the
  * median, i.e. the 100k-member class never funnels into one task.
  */
object P18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.add(t.taskInfo.duration)
    })

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def runOnce(name: String, dir: String): Unit = {
      // warmup (JIT + parquet footers), then one measured run with a
      // clean task log
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      clearState()
      taskMs.clear()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      clearState()
      import scala.jdk.CollectionConverters._
      val ds = taskMs.asScala.toSeq.sorted
      val med = if (ds.isEmpty) 0L else ds(ds.size / 2)
      val mx = if (ds.isEmpty) 0L else ds.last
      println(f"$name%-24s $dir%-16s wall $wall%7.2f s  rows $rows%10d  " +
        f"tasks ${ds.size}%5d  task-med ${med}%5d ms  task-max ${mx}%6d ms  " +
        f"max/med ${if (med > 0) mx.toDouble / med else 0.0}%6.1f")
    }

    Seq("/tmp/sf1", "/tmp/megaprobe").foreach { dir =>
      Seq("q_dedup_ngram_jaccard", "q_dedup_simhash").foreach { q =>
        runOnce(q, dir)
      }
    }
    spark.stop()
  }
}
