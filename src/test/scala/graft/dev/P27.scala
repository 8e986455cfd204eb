package graft.dev

import org.apache.spark.sql.SparkSession

/** One-off: print every line containing "Window" in the executed plans
  * of q_simjoin_prefix and q_dedup_lsh_eval at sf0.001. */
object P27 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q_simjoin_prefix", "q_dedup_lsh_eval").foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"== $n ==")
      plan.linesIterator.filter(_.contains("Window")).foreach(l =>
        println("  " + l.trim.take(160)))
    }
    spark.stop()
  }
}
