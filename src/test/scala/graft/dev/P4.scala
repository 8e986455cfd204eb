package graft.dev

import graft.Tables
import graft.ops.TextOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage breakdown of q_dedup_ngram_jaccard at sf0.1. */
object P4 {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[p4] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val DfCap = 1000
    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      val d = Tables.load(spark, dir, "documents").repartition(col("doc_id"))
      val base = d.select(col("doc_id"),
        array_distinct(shingles3(words(col("text")))).as("sh"))
      val ex = base.select(col("doc_id"), explode(col("sh")).as("s0"))
        .select(col("doc_id"), stringHash(col("s0")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("ex materialize")(ex.count())
      val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > DfCap).select("s")
      t("hot.count")(hot.count())
      val idx = ex.join(broadcast(hot), Seq("s"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("idx materialize")(idx.count())
      val nn = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
      t("nn.count")(nn.count())
      val a = idx.select(col("doc_id").as("doc_a"), col("s"))
      val b = idx.select(col("doc_id").as("doc_b"), col("s"))
      val pairs = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      t("pairs.count")(pairs.count())
      val g = pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      t("grouped.count")(g.count())
      val fin = g
        .join(broadcast(nn.select(col("doc_id").as("doc_a"), col("n").as("na"))), Seq("doc_a"))
        .join(broadcast(nn.select(col("doc_id").as("doc_b"), col("n").as("nb"))), Seq("doc_b"))
        .withColumn("jacc_bp",
          round(lit(10000.0) * col("shared") / (col("na") + col("nb") - col("shared")))
            .cast("long"))
        .filter(col("jacc_bp") >= 2000)
      t("final.count")(fin.count())
      t("registered full")(graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
