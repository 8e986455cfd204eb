package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Interleaved 3-way on the full jaccard pipeline: isolate the capped
  * UDAF cost from the eager mega-key collect cost.
  *  A: r6 plain (collect_list agg, persisted classes, no guard)
  *  B: UDAF agg persisted + when-projection, NO eager collect
  *  C: B + eager collect of mega keys on the cached aggregate
  */
object P16 {
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
    graft.functions.TextExpressions.register(spark)
    import graft.ops.TextOps._

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def rest(classes: DataFrame): DataFrame = {
      val DfCap = 1000L
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

    def keyedF(): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
      val base = d.select(col("doc_id"),
        shingleHashes(words(col("text"))).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
    }

    def qA(): DataFrame = {
      val classes = keyedF().groupBy("k")
        .agg(collect_list(col("doc_id")).as("ids"),
          first(col("hs")).as("hs"), count(lit(1)).as("cls"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      rest(classes)
    }
    def udafClasses(eager: Boolean): DataFrame = {
      val cap = 4096
      val agged = keyedF().groupBy("k")
        .agg(call_function("graft_capped_roster", col("doc_id"), lit(cap)).as("_cr"),
          first(col("hs")).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (eager)
        agged.filter(col("_cr.cls") > cap).select(col("k"), col("_cr.rep")).collect()
      agged.select(col("k"),
        when(col("_cr.cls") <= cap, col("_cr.ids"))
          .otherwise(array(col("_cr.rep"))).as("ids"),
        col("hs"), col("_cr.cls").as("cls"))
    }
    def qB(): DataFrame = rest(udafClasses(eager = false))
    def qC(): DataFrame = rest(udafClasses(eager = true))

    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    run(qA()); run(qB()); run(qC())
    val n = 5
    val (as, bs, cs) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    (1 to n).foreach { _ => as += run(qA()); bs += run(qB()); cs += run(qC()) }
    def stats(x: Seq[Double]) =
      f"median ${x.sorted.apply(x.size / 2)}%6.2f  min ${x.min}%6.2f  all ${x.map(v => f"$v%.2f").mkString(",")}"
    println("A r6-plain        " + stats(as.toSeq))
    println("B udaf-lazy       " + stats(bs.toSeq))
    println("C udaf-eager      " + stats(cs.toSeq))
    spark.stop()
  }
}
