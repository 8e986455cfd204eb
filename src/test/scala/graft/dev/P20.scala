package graft.dev

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** q_ngram_novelty string-vs-hashed shuffle A/B (VERDICT r8 item 7):
  * wall is expected ~flat at sf0.1 (the md5 hashing trades CPU for
  * exchange bytes), so the comparison that matters is SHUFFLE WRITE
  * BYTES — the quantity that dominates at corpus scale. */
object P20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.TextOps._

    val shuffleBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // the pre-round-9 plan: raw shingle STRINGS through both shuffles
    def noveltyStrings(): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
      val tok = d.select(col("doc_id"),
        explode(array_distinct(shingles3(words(col("text"))))).as("s"))
        .filter(col("s") =!= "")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val first = tok.groupBy("s").agg(min("doc_id").as("first_doc"))
      tok.join(first, Seq("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          expr("(n_novel * 10000) div n_shingles").as("novelty_bp"))
    }

    def run(label: String, f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warmup
      clearState()
      val walls = (1 to 3).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val sb = shuffleBytes.get()
        clearState()
        (dt, sb)
      }
      val med = walls.sortBy(_._1).apply(1)
      println(f"$label%-18s wall ${med._1}%6.2f s  shuffle-write ${med._2 / 1048576.0}%8.2f MiB")
    }
    run("A strings (r8)", noveltyStrings())
    run("B hashed (r9)",
      graft.SparkEntry.queries("q_ngram_novelty")(spark, dir))
    spark.stop()
  }
}
