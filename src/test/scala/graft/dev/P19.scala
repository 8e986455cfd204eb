package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10 streaming parity probe (carried since VERDICT r6): the six
  * streaming↔batch parity queries, timed at /tmp/sf1 (10x the driver
  * gate) and /tmp/sf10 (100x), with sf10 outputs dumped for the
  * DuckDB oracle compare (tools/check.py /tmp/sf10 /tmp/verify_sf10).
  * Suspected surface is state-store sizing: the withStatePartitions
  * dial was tuned at bench scale (8 partitions for a handful of
  * keys); sf10 puts 10M event ids through dropDuplicatesWithin-
  * Watermark and two-sided stream-stream join state.
  */
object P19 {
  def main(args: Array[String]): Unit = {
    val outRoot = "/tmp/verify_sf10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val names = Seq("q_stream_batch_parity", "q_stream_scd2_parity",
      "q_stream_watermark_dedup", "q_stream_stream_join",
      "q_stream_session_parity", "q_stream_window_parity")

    Seq("/tmp/sf1", "/tmp/sf10").foreach { dir =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          val rows =
            if (dir == "/tmp/sf10") {
              df.write.mode("overwrite").parquet(s"$outRoot/$name")
              spark.read.parquet(s"$outRoot/$name").count()
            } else df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-26s $dir%-10s wall $wall%8.2f s  rows $rows%10d")
        } catch { case e: Throwable =>
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-26s $dir%-10s FAILED after $wall%.1f s: " +
            e.toString.take(200))
        }
        clearState()
      }
    }
    spark.stop()
  }
}
