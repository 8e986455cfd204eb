package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 probe: PQ (M subspaces, k codewords) trade curve —
  * recall@10 of ADC top-10 vs the exact baseline, with the storage
  * cost per vector (M·log2(k) bits) alongside. Picks the production
  * PqM/PqK in VectorQueries with evidence.
  * args: sfDir (default sf0.01).
  */
object P33 {
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

    // (M, k): bits/vector = M * log2(k)
    val configs = Seq((4, 8), (4, 16), (8, 8), (8, 16), (8, 32), (16, 16))
    configs.foreach { case (pm, pk) =>
      val t0 = System.nanoTime()
      val ap = graft.queries.VectorQueries.pqAdcTopk(spark, dir, pm, pk)
        .select(col("q_id"), col("neighbor_id"))
      val hit = ex.join(ap, Seq("q_id", "neighbor_id"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      val bits = pm * (31 - Integer.numberOfLeadingZeros(pk))
      println(f"M=$pm%-3d k=$pk%-3d bits/vec=$bits%-3d recall@10 ${hit * 100.0 / nExact}%5.1f%%  wall $dt%5.2f s")
    }
    spark.stop()
  }
}
