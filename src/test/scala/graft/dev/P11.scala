package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: distinct-signature structure of the simhash corpus —
  * sizes the signature-level rewrite of q_dedup_simhash. */
object P11 {
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
    val sigs = base.groupBy("sim").agg(count(lit(1)).as("cls")).persist()
    val nSigs = sigs.count()
    println(s"docs: ${base.count()}  distinct sigs: $nSigs")
    sigs.orderBy(col("cls").desc).limit(10).collect()
      .foreach(r => println(s"  class sim=${r.getLong(0)} size=${r.getLong(1)}"))
    // intra-class (hamming 0) doc pairs
    val intra = sigs.agg(sum(col("cls") * (col("cls") - 1) / 2)).head.getDouble(0)
    println(f"intra-class doc pairs: $intra%.0f")
    // signature-level band join volume
    val bands = sigs.select(col("sim"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("sim"), 15 * j).bitwiseAND(lit(32767L)).as("bkey"))): _*)).as("b"))
      .select(col("sim"), col("b.band"), col("b.bkey"))
    val cand = bands.groupBy("band", "bkey").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0)
    println(f"sig-level candidate pairs: $cand%.0f")
    var t0 = System.nanoTime()
    val a = bands.select(col("sim").as("sim_a"), col("band"), col("bkey"))
    val b2 = bands.select(col("sim").as("sim_b"), col("band"), col("bkey"))
    val sigPairs = a.join(b2, Seq("band", "bkey"))
      .filter(col("sim_a") < col("sim_b"))
      .select("sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= 3)
      .persist()
    val nSigPairs = sigPairs.count()
    println(f"near-dup sig pairs (hamming<=3): $nSigPairs  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    // total doc-pair output = intra + sum over sig pairs of clsA*clsB
    t0 = System.nanoTime()
    val cross = sigPairs
      .join(sigs.select(col("sim").as("sim_a"), col("cls").as("ca")), Seq("sim_a"))
      .join(sigs.select(col("sim").as("sim_b"), col("cls").as("cb")), Seq("sim_b"))
      .agg(sum(col("ca") * col("cb"))).head
    val crossN = if (cross.isNullAt(0)) 0.0 else cross.getDouble(0)
    println(f"cross-class doc pairs: $crossN%.0f  -> TOTAL output ${intra + crossN}%.0f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    spark.stop()
  }
}
