package graft.dev

import graft.pipeline.{Etl1, Etl2}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage breakdown of q_star_fact at sf0.1. */
object P6 {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[p6] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    val dir = "/root/testdata/sf0.1"
    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      val raw = graft.queries.StarQueries.rawSynth(spark, dir)
      t("raw.count")(raw.count())
      val st = Etl1.stage(raw)
      t("stage.count")(st.count())
      val df = Etl2.keyed(st)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("keyed materialize")(df.count())
      val (dv, _, _) = Etl2.dimensions(df)
      val dvC = dv.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("dim_vehicle materialize")(dvC.count())
      val res = Etl2.resolveVehicles(df, dvC)
      t("resolve.count")(res.count())
      val f = Etl2.fact(df, res)
      t("fact.count")(f.count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
