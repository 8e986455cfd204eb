package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe: IVF-PQ + exact re-rank recall/budget curve
  * (VERDICT r12 item 1). Sweeps the code-scan dial (nprobe of IvfK=64
  * cells) at the shipping (8,256) PQ geometry and the fixed
  * top-(N div 8) exact-re-rank budget, against the exact baseline.
  * Picks the shipping IvfPqProbe with evidence.
  * args: sfDir (default sf0.01).
  */
object P36 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    val ex = graft.queries.VectorQueries.qAnnCosineTopk.build(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
      .persist()
    val nExact = ex.count()
    println(s"== exact baseline: $nExact (q,neighbor) rows ==")

    Seq(8, 16, 24, 32, 48).foreach { np =>
      val t0 = System.nanoTime()
      val ranked = graft.queries.VectorQueries.ivfPqAdcRanked(spark, dir, np)
      val nScan = ranked.count()
      val rr = graft.queries.VectorQueries.ivfPqReranked(spark, dir, ranked)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      val ap = rr.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
      val hit = ex.join(ap, Seq("q_id", "neighbor_id"), "left_semi").count()
      graft.queries.VectorQueries.releaseAdcBarriers()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"np=$np%-3d recall@10 ${hit * 100.0 / nExact}%5.1f%%  code_scanned=$nScan%-7d wall $dt%5.2f s")
    }
    spark.stop()
  }
}
