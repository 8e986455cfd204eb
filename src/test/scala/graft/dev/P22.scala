package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** P22 — does the round-10 star-direct fast path (escalateAfter=0 +
  * uniqueOrderedPairs) also beat bounded min-label propagation on the
  * STAR-shaped dedup graphs, or only on the chain-shaped mutual-kNN
  * manifold? The r10 DEVLOG kept dedup on the default budget by shape
  * argument ("phase 1 converges in <= 3 cheap rounds"); the r9 VERDICT
  * described the same queries as "large-star/small-star" — i.e.
  * escalating. This probe measures instead of arguing: same persisted
  * ngram-Jaccard pair input, A = default budget, B = star-direct;
  * labels must be identical (both converge to the component minimum).
  *
  * args: [sfDir]  (default /root/testdata/sf0.1)
  */
object P22 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    val pairs = TextQueries.ngramJaccardPairs(spark, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val nBad = pairs.filter(col("u") >= col("v")).count()
    val nDup = nPairs - pairs.distinct().count()
    println(s"[p22] pairs=$nPairs  u>=v rows=$nBad  dup rows=$nDup")
    require(nBad == 0 && nDup == 0, "input is not unique ordered pairs")

    def run(fast: Boolean): Long = {
      val out =
        if (fast) graft.ops.Components.connectedComponents(
          pairs, escalateAfter = 0, uniqueOrderedPairs = true)
        else graft.ops.Components.connectedComponents(pairs)
      // same materialization a query consumer pays
      out.write.mode("overwrite").format("noop").save()
      out.count()
    }
    // label parity once, before timing
    val a = graft.ops.Components.connectedComponents(pairs)
      .withColumnRenamed("comp", "comp_a")
    val b = graft.ops.Components.connectedComponents(
        pairs, escalateAfter = 0, uniqueOrderedPairs = true)
      .withColumnRenamed("comp", "comp_b")
    val joined = a.join(b, Seq("vtx"), "full")
    val mismatch = joined.filter(
      col("comp_a").isNull || col("comp_b").isNull ||
      col("comp_a") =!= col("comp_b")).count()
    println(s"[p22] vertices=${a.count()}  label mismatches=$mismatch")
    require(mismatch == 0, "fast path changed the labels")

    for (mode <- Seq("default", "fast"); pass <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = run(mode == "fast")
      val s = (System.nanoTime() - t0) / 1e9
      val tag = if (pass == 1) "warmup" else s"pass$pass"
      println(f"[p22] $mode%-7s $tag%-7s ${s}%6.2f s  (rows=$n)")
    }
    spark.stop()
  }
}
