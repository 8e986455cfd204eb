package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Interleaved A/B: the r6 jaccard plan (plain collect_list, no
  * guard) vs the current registered q_dedup_ngram_jaccard, alternated
  * pass by pass in one JVM so host drift cancels. */
object P15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextOps._

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // the r6 plan, reconstructed from git 197c3ad TextQueries:225-281
    def r6Jaccard(): DataFrame = {
      val DfCap = 1000L
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
      val base = d.select(col("doc_id"),
        shingleHashes(words(col("text"))).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val keyed = base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
      val classes = keyed.groupBy("k")
        .agg(collect_list(col("doc_id")).as("ids"),
          first(col("hs")).as("hs"), count(lit(1)).as("cls"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ex = classes.select(col("k"), col("cls"), explode(col("hs")).as("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hot = ex.groupBy("s").agg(sum(col("cls")).as("df"))
        .filter(col("df") > DfCap).select("s")
      val idx = ex.join(broadcast(hot), Seq("s"), "left_anti")
        .select("k", "s")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nn = idx.groupBy("k").agg(count(lit(1)).as("n"))
      val shared = idx.select(col("k").as("ka"), col("s"))
        .join(idx.select(col("k").as("kb"), col("s")), Seq("s"))
        .filter(col("ka") < col("kb"))
        .groupBy("ka", "kb").agg(count(lit(1)).as("shared"))
      val cp = shared
        .join(nn.select(col("k").as("ka"), col("n").as("na")), Seq("ka"))
        .join(nn.select(col("k").as("kb"), col("n").as("nb")), Seq("kb"))
        .withColumn("jacc_bp",
          round(lit(10000.0) * col("shared") / (col("na") + col("nb") - col("shared")))
            .cast("long"))
        .filter(col("jacc_bp") >= 2000)
      val cross = cp
        .join(classes.select(col("k").as("ka"), col("ids").as("ids_a")), Seq("ka"))
        .join(classes.select(col("k").as("kb"), col("ids").as("ids_b")), Seq("kb"))
        .select(col("shared"), col("jacc_bp"), explode(col("ids_a")).as("da"), col("ids_b"))
        .select(col("shared"), col("jacc_bp"), col("da"), explode(col("ids_b")).as("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("shared"), col("jacc_bp"))
      val intra = classes.filter(col("cls") > 1)
        .join(nn, Seq("k"))
        .select(col("n"), explode(col("ids")).as("da"), col("ids"))
        .select(col("n"), col("da"), explode(col("ids")).as("db"))
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      cross.unionByName(intra)
        .select("doc_a", "doc_b", "shared", "jacc_bp")
    }

    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    // warmup both
    run(r6Jaccard())
    run(graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir))
    val n = 5
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to n).foreach { _ =>
      as += run(r6Jaccard())
      bs += run(graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir))
    }
    def stats(x: Seq[Double]) =
      f"median ${x.sorted.apply(x.size / 2)}%6.2f  min ${x.min}%6.2f  all ${x.map(v => f"$v%.2f").mkString(",")}"
    println("A r6-plain   " + stats(as.toSeq))
    println("B current    " + stats(bs.toSeq))
    spark.stop()
  }
}
