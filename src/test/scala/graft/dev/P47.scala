package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P47 (round 14): where does the DRIVER spend the stream parities'
  * wall? P40 shows jobs cover only ~45% of wall; P42 samples executor
  * workers only. This samples EVERY thread every 50 ms while a stream
  * query runs and histograms RUNNABLE non-executor threads by their
  * deepest org.apache.spark frame.
  * Usage: Test/runMain graft.dev.P47 <sfDir> <query...> */
object P47 {
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
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val traces = Thread.getAllStackTraces
          traces.forEach { (t, frames) =>
            val n = t.getName
            if (!n.startsWith("Executor task launch worker") &&
                !n.contains("sampler") && frames.nonEmpty &&
                t.getState == Thread.State.RUNNABLE) {
              val interesting = frames.find { f =>
                val c = f.getClassName
                c.startsWith("org.apache.spark") || c.startsWith("org.apache.hadoop") ||
                c.startsWith("graft")
              }.getOrElse(frames.head)
              val top = frames.head
              val key = f"${n.take(28)}%-28s ${interesting.getClassName.split('.').takeRight(2).mkString(".")}.${interesting.getMethodName}  [top: ${top.getClassName.split('.').takeRight(1).mkString}.${top.getMethodName}]"
              hist(key) += 1
            }
          }
          Thread.sleep(50)
        }
      }, "p47-sampler")
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      runFully(name)
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      sampler.join(1000)
      clearState()
      println(f"== $name wall=$wall%.2f s (50ms samples) ==")
      hist.toSeq.sortBy(-_._2).take(30).foreach { case (k, c) =>
        println(f"  $c%4d  $k")
      }
    }
    spark.stop()
  }
}
