package graft.dev
import graft.Tables
import graft.ops.TextOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object P5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents").repartition(col("doc_id"))
    val base = d.select(col("doc_id"), array_distinct(shingles3(words(col("text")))).as("sh"))
    val ex = base.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), stringHash(col("s0")).as("s"))
    ex.explain("formatted")
    spark.stop()
  }
}
