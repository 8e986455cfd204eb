package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-11 probe: q_star_fact stage-by-stage wall at sf1 (VERDICT r10
  * item 4 — the composed cascade's 5.1x/decade growth). Replicates
  * StarQueries.gold with a noop materialization after each stage so
  * the per-stage cost is visible. args: sfDir [passes]. */
object P30 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
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
    graft.Tables.ensureConf(spark)
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    if (args.drop(2).headOption.contains("granular")) {
      import graft.queries.StarQueries.rawSynth
      import graft.pipeline.{Etl1, Etl2}
      import org.apache.spark.sql.expressions.Window
      (1 to passes).foreach { p =>
        println(s"== granular pass $p ==")
        t("rawSynth only")(noop(rawSynth(spark, dir)))
        val w = Window.partitionBy("tempRegistrationNumber")
          .orderBy(col("fromdate").desc, col("todate").desc, col("slno").asc)
        t("synth+window dedup")(noop(rawSynth(spark, dir)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")))
        t("full Etl1.stage")(noop(Etl1.stage(rawSynth(spark, dir))))
        t("stage+keyed (no persist)")(noop(Etl2.keyed(Etl1.stage(rawSynth(spark, dir)))))
        val pers = Etl2.keyed(Etl1.stage(rawSynth(spark, dir)))
          .persist(StorageLevel.MEMORY_AND_DISK)
        t("stage+keyed persist")(noop(pers))
        clear()
      }
      spark.stop(); return
    }

    (1 to passes).foreach { p =>
      println(s"== pass $p ==")
      val df = graft.pipeline.Etl2.keyed(
          graft.pipeline.Etl1.stage(graft.queries.StarQueries.rawSynth(spark, dir)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("stage+keyed")(noop(df))
      val (dv, dm, dr) = graft.pipeline.Etl2.dimensions(df)
      val dvC = dv.persist(StorageLevel.MEMORY_AND_DISK)
      t("dim_vehicle")(noop(dvC))
      val dfObs = df.withColumn("modelName",
        when(col("slno") % 13 === 1, concat(col("modelName"), lit("Q")))
          .otherwise(col("modelName")))
      val res = graft.pipeline.Etl2.resolveVehicles(dfObs, dvC)
      t("resolve")(noop(res))
      t("fact")(noop(graft.pipeline.Etl2.fact(dfObs, res)))
      clear()
    }
    spark.stop()
  }
}
