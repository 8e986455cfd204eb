package graft.dev

import org.apache.spark.sql.SparkSession

/** Cold-pass profiler: like Bench, clears persisted blocks between
  * passes, so each timing includes rebuilding any persist() the query
  * plans. Usage: Cold <sfDir> <passes> <name...>  */
object Cold {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      // keep in lockstep with graft.Bench.runFully — both harnesses
      // must execute the full plan the same way or they diverge
      def runFully(): Unit =
        q(spark, dir).write.mode("overwrite").format("noop").save()
      runFully(); clearState() // warmup
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        runFully()
        val dt = (System.nanoTime() - t0) / 1e9
        clearState()
        dt
      }
      println(f"[cold] $name%-28s min ${ts.min}%6.2f  med ${ts.sorted.apply(passes / 2)}%6.2f  max ${ts.max}%6.2f")
    }
    spark.stop()
  }
}
