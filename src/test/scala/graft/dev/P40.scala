package graft.dev

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P40 (round 13, optimization): per-JOB wall breakdown of the
  * expensive ANN queries — where do q_ann_ivfpq_recall's ~4.5 s go?
  * A listener logs every job's (duration, #tasks, first-stage name);
  * queries run once warm then once timed, cache cleared between.
  * Usage: Test/runMain graft.dev.P40 <sfDir> <query...> */
object P40 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
        var nTasks: Int = 0, var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stages = mutable.LinkedHashMap[Int, String]()
    @volatile var capture = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        val j = J(e.jobId, t0 = e.time)
        j.nTasks = e.stageInfos.map(_.numTasks).sum
        j.desc = e.stageInfos.lastOption.map(_.name.take(90)).getOrElse("")
        jobs.synchronized { jobs(e.jobId) = j }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (capture) {
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = e.stageInfo
          val wall = (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 0.3) {
            val m = si.taskMetrics
            val line = f"stage ${si.stageId}%3d wall=$wall%6.2f " +
              f"run=${m.executorRunTime / 1e3}%6.2f " +
              f"cpu=${m.executorCpuTime / 1e9}%6.2f " +
              f"deser=${m.executorDeserializeTime / 1e3}%5.2f " +
              f"gc=${m.jvmGCTime / 1e3}%5.2f " +
              f"resSer=${m.resultSerializationTime / 1e3}%5.2f " +
              f"tasks=${si.numTasks}%3d  ${si.name.take(70)}"
            stages.synchronized { stages(si.stageId) = line }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def runFully(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    names.foreach { name =>
      runFully(name); clearState() // warm
      jobs.synchronized(jobs.clear())
      stages.synchronized(stages.clear())
      capture = true
      val w0 = System.nanoTime()
      runFully(name)
      val wall = (System.nanoTime() - w0) / 1e9
      capture = false
      // let async job-end events drain
      Thread.sleep(300)
      clearState()
      println(f"== $name wall=$wall%.2f s ==")
      var acct = 0.0
      jobs.synchronized {
        jobs.values.foreach { j =>
          val d = if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0
          if (d > 0) acct += d
          println(f"  job ${j.id}%3d  ${d}%7.3f s  tasks=${j.nTasks}%4d  ${j.desc}")
        }
      }
      println(f"  [sum of jobs $acct%.2f s; gap to wall = driver/planning/codegen]")
      stages.synchronized { stages.values.foreach(l => println("  " + l)) }
    }
    spark.stop()
  }
}
