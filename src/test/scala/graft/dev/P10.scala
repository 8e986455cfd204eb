package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: simhash band bucket skew + candidate volume at a
  * given sfDir — where does q_dedup_simhash's time go at sf10? */
object P10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.TextOps._
    val d = graft.Tables.load(spark, dir, "documents").repartition(col("doc_id"))
    val base = d.select(col("doc_id"),
      simhash60Native(wordHashes60(words(col("text")))).as("sim"))
      .persist()
    var t0 = System.nanoTime()
    val nDocs = base.count()
    println(f"docs: $nDocs  (derive+count ${(System.nanoTime()-t0)/1e9}%.1f s)")
    val bands = base.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("sim"), 15 * j).bitwiseAND(lit(32767L)).as("bkey"))): _*)).as("b"))
      .select(col("doc_id"), col("sim"), col("b.band"), col("b.bkey"))
      .persist()
    t0 = System.nanoTime()
    val top = bands.groupBy("band", "bkey").count()
      .orderBy(col("count").desc).limit(20).collect()
    println(f"band rows: ${bands.count()}  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    println("top buckets (band, bkey, n):")
    top.foreach(r => println(s"  ${r.getInt(0)} ${r.getLong(1)} ${r.getLong(2)}"))
    t0 = System.nanoTime()
    val pairSum = bands.groupBy("band", "bkey").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0)
    println(f"candidate pairs (pre-distinct): $pairSum%.0f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    t0 = System.nanoTime()
    val a = bands.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"),
      col("band"), col("bkey"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"),
      col("band"), col("bkey"))
    val nPairsDistinct = a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b").distinct().count()
    println(f"distinct pairs: $nPairsDistinct  (join+distinct ${(System.nanoTime()-t0)/1e9}%.1f s)")
    spark.stop()
  }
}
