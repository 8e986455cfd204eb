package graft.dev

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Timing probe for q_vec_quantize at sf0.1 (noop sink, 3 passes). */
object P7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val name = if (args.nonEmpty) args(0) else "q_vec_quantize"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    for (p <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"[p7] $name pass $p ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
