package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P49 (round 14): same-JVM interleaved ABBA of the r13 Components
  * star-loop conf (AQE off + pinned partitions inside the loop) via
  * its -Dgraft.components.loopAqe control arm — the A/B VERDICT r13
  * item 2 asked for. Also covers q_assoc_rules (no toggle — measured
  * against the pre-change worktree separately).
  * Usage: Test/runMain graft.dev.P49 <sfDir> [passes] */
object P49 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val names = Seq("q_dedup_components", "q_dedup_apply", "q_semantic_clusters")
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
    names.foreach(runFully)
    sys.props.remove("graft.components.loopAqe")
    names.foreach(runFully)

    val acc = mutable.Map[(String, String), mutable.ArrayBuffer[Double]]()
    def run(setting: Option[String]): Unit = {
      setting match {
        case Some(v) => sys.props("graft.components.loopAqe") = v
        case None => sys.props.remove("graft.components.loopAqe")
      }
      val key = setting.getOrElse("loopConf")
      names.foreach { n =>
        acc.getOrElseUpdate((n, key), mutable.ArrayBuffer()) += runFully(n)
      }
    }
    for (_ <- 1 to passes) {
      run(Some("true")); run(None); run(None); run(Some("true"))
    }
    names.foreach { n =>
      def med(s: String) = { val xs = acc((n, s)).sorted; xs(xs.size / 2) }
      println(f"$n%-24s aqeLoop(control) ${med("true")}%6.2f s   loopConf(r13) ${med("loopConf")}%6.2f s")
    }
    spark.stop()
  }
}
