package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: distinct shingle-SET classes in the corpus — sizes a
  * set-level rewrite of the jaccard/containment index. */
object P13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.TextOps._
    val d = graft.Tables.load(spark, dir, "documents").repartition(col("doc_id"))
    val base = d.select(col("doc_id"),
      shingleHashes(words(col("text"))).as("hs"))
    // shingleHashes emits first-occurrence order; sort for a canonical
    // set identity
    val keyed = base.withColumn("k", xxhash64(array_sort(col("hs"))))
    val classes = keyed.groupBy("k").agg(count(lit(1)).as("cls"))
    val agg = classes.agg(count(lit(1)).as("n_classes"),
      sum(col("cls") * (col("cls") - 1)).as("intra2x"),
      max(col("cls")).as("max_cls")).head
    println(s"docs=${base.count()} classes=${agg.getLong(0)} maxClass=${agg.getLong(2)} intraPairs=${agg.getLong(1) / 2}")
    // exact normalized-text classes for comparison
    val t = d.select(xxhash64(lower(trim(col("text")))).as("tk"))
      .groupBy("tk").count()
    println(s"exact-text classes=${t.count()}")
    spark.stop()
  }
}
