package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: q_semantic_clusters time breakdown — kNN edge
  * construction vs connected-components rounds. */
object P12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    (1 to 3).foreach { pass =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      var t0 = System.nanoTime()
      val edges = graft.queries.VectorQueries.knnEdgesForDev(spark, dir)
        .select(col("vec_a").as("u"), col("vec_b").as("v"))
        .persist()
      val ne = edges.count()
      val tEdges = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val comp = graft.ops.Components.connectedComponents(edges)
      val nc = comp.agg(countDistinct(col("comp"))).head.getLong(0)
      val tComp = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass: edges=$ne (${tEdges}%.2f s)  components=$nc (${tComp}%.2f s)")
    }
    spark.stop()
  }
}
