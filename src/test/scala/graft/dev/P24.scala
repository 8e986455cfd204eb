package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: graph-trio constant factors. (a) how much of
  * q_pagerank is the window-function edge derivation vs the 3 unrolled
  * rounds; (b) does persisting the round-invariant edges⋈outdeg
  * contribution frame (repartitioned by src so only ranks shuffles per
  * round) win; (c) parity. args: sfDir. */
object P24 {
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
    graft.Tables.ensureConf(spark)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def prContrib(): DataFrame = {
      val edges = graft.queries.GraphQueries.handoffEdges(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val contrib = edges.join(outdeg, Seq("src"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to 3) {
        val inbound = contrib
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
          .groupBy("node")
          .agg(sum(col("c")).as("s"))
        ranks = nodes.join(inbound, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("node").asc).limit(20)
        .select(col("node"), col("rank").as("rank_micros"))
    }

    (1 to 3).foreach { pass =>
      t(f"pass $pass edges only") {
        noop(graft.queries.GraphQueries.handoffEdges(spark, dir))
      }
      clear()
      t(f"pass $pass PR current") {
        noop(graft.queries.GraphQueries.qPagerank.build(spark, dir))
      }
      clear()
      t(f"pass $pass PR contrib") { noop(prContrib()) }
      clear()
    }
    println("== parity ==")
    val cur = graft.queries.GraphQueries.qPagerank.build(spark, dir)
      .collect().map(_.toString).toSeq
    clear()
    val alt = prContrib().collect().map(_.toString).toSeq
    clear()
    println(s"  equal=${cur == alt} n=${cur.size}")
    spark.stop()
  }
}
