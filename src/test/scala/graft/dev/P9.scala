package graft.dev

import org.apache.spark.sql.SparkSession

/** Scratch probe: print a query's executed plan (args: name [sfDir]). */
object P9 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_hll_rollup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("== EXECUTED ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
