package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P42 (round 13, optimization): WHERE do streaming-trigger tasks
  * block? Stream-join trigger stages measure run≈6.5 s vs cpu≈0.55 s
  * (P40) — ~90% of task time off-CPU. A sampler thread dumps every
  * "Executor task launch worker" stack every 100 ms while the query
  * runs and aggregates the deepest interesting frame, attributing the
  * off-CPU time. Usage: Test/runMain graft.dev.P42 <sfDir> <query...> */
object P42 {
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
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def runFully(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    names.foreach { name =>
      runFully(name); clearState() // warm
      val hist = mutable.HashMap[String, Int]().withDefaultValue(0)
      val stateHist = mutable.HashMap[String, Int]().withDefaultValue(0)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val traces = Thread.getAllStackTraces
          traces.forEach { (t, frames) =>
            if (t.getName.startsWith("Executor task launch worker") &&
                frames.nonEmpty) {
              stateHist(t.getState.toString) += 1
              // deepest frame that is not pure JDK plumbing
              val interesting = frames.find { f =>
                val c = f.getClassName
                !c.startsWith("java.") && !c.startsWith("jdk.") &&
                !c.startsWith("sun.") && !c.startsWith("scala.concurrent.")
              }.getOrElse(frames.head)
              val top = frames.head
              val key = s"${t.getState}  ${interesting.getClassName.split('.').takeRight(2).mkString(".")}.${interesting.getMethodName}  [top: ${top.getClassName.split('.').takeRight(1).mkString}.${top.getMethodName}]"
              hist(key) += 1
            }
          }
          Thread.sleep(100)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      runFully(name)
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      sampler.join(1000)
      clearState()
      println(f"== $name wall=$wall%.2f s ==")
      println(s"  thread states: ${stateHist.toSeq.sortBy(-_._2).mkString(", ")}")
      hist.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
        println(f"  $n%4d  $k")
      }
    }
    spark.stop()
  }
}
