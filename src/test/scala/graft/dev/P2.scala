package graft.dev

import graft.Tables
import graft.ops.TextOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object P2 {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = Tables.load(spark, dir, "documents")
    val base = d.select(col("doc_id"),
      array_distinct(shingles3(words(col("text")))).as("sh"))
    for (i <- 1 to 2) {
      t("base.count")(base.count())
      t("shingle sizes sum")(base.select(sum(size(col("sh")))).collect())
      val ex = base.select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("s0"))
        .select(col("doc_id"), col("n"), stringHash(col("s0")).as("s"))
      t("ex.count")(ex.count())
      val a = ex.select(col("doc_id").as("doc_a"), col("n").as("na"), col("s"))
      val b = ex.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("s"))
      val j = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      t("join.count")(j.count())
      val g = j.groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1)).as("shared"))
      t("group.count")(g.count())
    }
    spark.stop()
  }
}
