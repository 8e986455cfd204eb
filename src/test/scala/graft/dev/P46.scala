package graft.dev

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** P46 (round 14): A/B/C of codegen policy over the RTA/star family —
  * default (hugeMethodLimit 65535: stages whose generated processNext
  * exceeds HotSpot's DontCompileHugeMethods limit of 8000 bytecodes
  * run INTERPRETED by the JVM), hugeMethodLimit=8000 (Spark falls back
  * to the non-codegen path exactly when the JIT would refuse), and
  * wholeStage=false (control). Interleaved passes, median per config.
  * Usage: Test/runMain graft.dev.P46 <sfDir> [passes] [names...] */
object P46 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_star_fact", "q_star_dim_vehicle", "q_fact_assembly",
        "q_resolution_fuzzy", "q_dim_build", "q_scd2_fold",
        "q1_pricing_summary", "q_surrogate_keys", "q_misalign_repair")
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
    val configs = Seq(
      "default" -> (() => {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
      }),
      "huge8000" -> (() => {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
      }),
      "wscgOff" -> (() => {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
      }))
    def runFully(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    val res = mutable.LinkedHashMap[(String, String), mutable.ArrayBuffer[Double]]()
    // warm every (config, query) once
    configs.foreach { case (_, set) => set();
      names.foreach(n => try runFully(n) catch { case _: Throwable => () }) }
    (1 to passes).foreach { _ =>
      configs.foreach { case (cfg, set) =>
        set()
        names.foreach { n =>
          val dt = runFully(n)
          res.getOrElseUpdate((n, cfg), mutable.ArrayBuffer()) += dt
        }
      }
    }
    names.foreach { n =>
      val line = configs.map { case (cfg, _) =>
        val ts = res((n, cfg)).sorted
        f"$cfg=${ts(ts.size / 2)}%6.3f"
      }.mkString("  ")
      println(f"$n%-24s $line")
    }
    spark.stop()
  }
}
