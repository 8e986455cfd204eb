package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P44 (round 13, optimization): same-JVM interleaved ABBA A/B of
  * Components' loop-AQE flag (-Dgraft.components.loopAqe) over the
  * closure-shaped queries. Usage: Test/runMain graft.dev.P44 <sfDir>
  * [passes] [query...] */
object P44 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_semantic_clusters", "q_dedup_components", "q_dedup_apply")
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
    def runFully(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    sys.props("graft.components.loopAqe") = "true"
    names.foreach(runFully) // warm both arms
    sys.props("graft.components.loopAqe") = "false"
    names.foreach(runFully)
    val acc = mutable.Map[(String, String), mutable.ArrayBuffer[Double]]()
    def run(setting: String): Unit = {
      sys.props("graft.components.loopAqe") = setting
      names.foreach { n =>
        acc.getOrElseUpdate((n, setting), mutable.ArrayBuffer()) += runFully(n)
      }
    }
    for (_ <- 1 to passes) { run("true"); run("false"); run("false"); run("true") }
    names.foreach { n =>
      def med(s: String) = { val xs = acc((n, s)).sorted; xs(xs.size / 2) }
      println(f"$n%-24s loopAqe=on ${med("true")}%6.2f s   off ${med("false")}%6.2f s")
    }
    spark.stop()
  }
}
