package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 probe: trained-IVF (k, nprobe) trade curve — recall@10 vs
  * scanned-candidate count at one SF, all configs against the same
  * exact baseline. Picks the production constants in VectorQueries
  * (IvfK/IvfProbe) with evidence instead of a guess.
  * args: sfDir (default sf0.01).
  */
object P32 {
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

    val ex = graft.queries.VectorQueries.qAnnCosineTopk.build(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
      .persist()
    val nExact = ex.count()
    println(s"== exact baseline: $nExact (q,neighbor) rows ==")

    val configs = Seq((16, 1), (16, 2), (16, 4), (16, 8), (32, 2), (32, 4),
      (32, 8), (32, 16), (64, 8), (64, 16))
    configs.foreach { case (k, np) =>
      val t0 = System.nanoTime()
      val cand = graft.queries.VectorQueries
        .ivfTrainedCandidates(spark, dir, k, np)
        .persist()
      val nCand = cand.count()
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      val ap = cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
      val hit = ex.join(ap, Seq("q_id", "neighbor_id"), "left_semi").count()
      cand.unpersist()
      // leave ex and the per-config base caches alone: corpora here are
      // tiny (≤5k rows) and a blanket clear would evict the shared
      // exact baseline between configs
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"k=$k%-3d nprobe=$np%-2d recall@10 ${hit * 100.0 / nExact}%5.1f%%  candidates $nCand%7d  wall $dt%5.2f s")
    }
    spark.stop()
  }
}
