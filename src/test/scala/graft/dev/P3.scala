package graft.dev

import org.apache.spark.sql.SparkSession

/** Does a second, separately-built instance of a query reuse the
  * first build's persisted data (CacheManager sameResult match)? */
object P3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val name = if (args.nonEmpty) args(0) else "q_dedup_ngram_jaccard"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"build$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println("cached entries: " + spark.sharedState.cacheManager.isEmpty)
    spark.stop()
  }
}
