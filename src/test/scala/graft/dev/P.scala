package graft.dev

import org.apache.spark.sql.SparkSession

object P {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries(args(0))
    val df = q(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
