package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe: does deeper Lloyd training lift (8,256) PQ recall
  * past the 70% gate (VERDICT r12 item 5)? Sweeps training rounds at
  * the shipping geometry; each extra round costs one more corpus pass
  * + assignment, and — if shipped — one more CTE block in the oracle.
  * args: sfDir (default sf0.01).
  */
object P35 {
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

    Seq(2, 3, 4, 6).foreach { iters =>
      val t0 = System.nanoTime()
      val ap = graft.queries.VectorQueries.pqAdcTopk(spark, dir, 8, 256, iters)
        .select(col("q_id"), col("neighbor_id"))
      val hit = ex.join(ap, Seq("q_id", "neighbor_id"), "left_semi").count()
      graft.queries.VectorQueries.releaseAdcBarriers()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"iters=$iters%-2d recall@10 ${hit * 100.0 / nExact}%5.1f%%  wall $dt%5.2f s")
    }
    spark.stop()
  }
}
