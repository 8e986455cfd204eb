package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-11 probe: VERDICT r10 item 2 — fuse two star/propagation
  * rounds per materialization (Components.Fuse knob) to halve driver
  * round-trips in the iterative family. Interleaved same-host A/B,
  * medians of 3, fuse=1 (production) vs fuse=2. args: sfDir. */
object P29 {
  private val Family =
    Seq("q_dedup_components", "q_dedup_apply", "q_semantic_clusters")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clear()
      dt
    }

    Family.foreach { name =>
      runOnce(name) // warm
      val f1 = collection.mutable.ArrayBuffer[Double]()
      val f2 = collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        sys.props("graft.components.fuse") = "1"
        f1 += runOnce(name)
        sys.props("graft.components.fuse") = "2"
        f2 += runOnce(name)
      }
      sys.props.remove("graft.components.fuse")
      println(f"$name%-22s fuse1 ${f1.sorted.apply(1)}%6.2f s   fuse2 ${f2.sorted.apply(1)}%6.2f s")
    }
    spark.stop()
  }
}
