package graft.dev

import org.apache.spark.sql.SparkSession

/** P45 (round 14): WHERE does q_star_fact's 19 s of stage CPU go?
  * Times noop-sink materializations of the pipeline's sub-chains
  * (synth → stage → keyed), each with whole-stage codegen ON and OFF —
  * if OFF is not slower, the generated method has fallen out of JIT
  * compilation (the r13 DontCompileHugeMethods class).
  * Usage: Test/runMain graft.dev.P45 <sfDir> */
object P45 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      mk.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s median ${ts(1)}%6.3f s (min ${ts.head}%.3f max ${ts.last}%.3f)")
    }

    import graft.queries.StarQueries
    import graft.pipeline.{Etl1, Etl2}
    Seq(true, false).foreach { cg =>
      spark.conf.set("spark.sql.codegen.wholeStage", cg.toString)
      println(s"== wholeStageCodegen=$cg ==")
      time("rawSynth") { StarQueries.rawSynth(spark, dir) }
      time("stage(rawSynth)") { Etl1.stage(StarQueries.rawSynth(spark, dir)) }
      time("keyed(stage)") { Etl2.keyed(Etl1.stage(StarQueries.rawSynth(spark, dir))) }
    }
    spark.stop()
  }
}
