package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P43 (round 13, optimization): same-JVM interleaved ABBA A/B of the
  * checkpoint fileChecksum conf over the six stream parity queries.
  * ensureStreamConf reads -Dgraft.stream.ckChecksum at each builder
  * invocation, so flipping the system property between runs flips the
  * conf inside ONE JVM — no cross-session host-noise confound.
  * Usage: Test/runMain graft.dev.P43 <sfDir> [passes] */
object P43 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val names = Seq("q_stream_batch_parity", "q_stream_scd2_parity",
      "q_stream_watermark_dedup", "q_stream_stream_join",
      "q_stream_session_parity", "q_stream_window_parity")
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
    // warmup both settings
    sys.props("graft.stream.ckChecksum") = "true"
    names.foreach(runFully)
    sys.props("graft.stream.ckChecksum") = "false"
    names.foreach(runFully)

    val acc = mutable.Map[(String, String), mutable.ArrayBuffer[Double]]()
    def run(setting: String): Unit = {
      sys.props("graft.stream.ckChecksum") = setting
      names.foreach { n =>
        acc.getOrElseUpdate((n, setting), mutable.ArrayBuffer()) += runFully(n)
      }
    }
    for (_ <- 1 to passes) { run("true"); run("false"); run("false"); run("true") }
    names.foreach { n =>
      def med(s: String) = {
        val xs = acc((n, s)).sorted; xs(xs.size / 2)
      }
      println(f"$n%-28s checksum=on ${med("true")}%6.2f s   off ${med("false")}%6.2f s")
    }
    spark.stop()
  }
}
