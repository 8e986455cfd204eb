package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** P41 (round 13): fragment-level timing of the PQ-ADC chain at sf0.1 —
  * which piece of the ~2 s single-task stage is hot?
  *   A. corpus encode (normalize+quantize+8 assigns) -> noop
  *   B. encode WITHOUT the 8 PQ assigns (prep only) -> noop
  *   C. from a pre-materialized corpus: qt + BNLJ + sim + windows -> noop
  *   D. C but sim replaced with a constant (is it the element_at's?)
  * Usage: Test/runMain graft.dev.P41 <sfDir> */
object P41 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.VectorOps._
    import graft.ops.KMeans

    val Dims = 64; val pm = 8; val pk = 256; val sub = Dims / pm
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[p41] $label%-34s med ${ts(1)}%6.2f  min ${ts.head}%6.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val base = withNormalizedNative(
        graft.Tables.load(spark, dir, "embeddings"), "embedding", "vn")
      .select(col("vec_id"), col("vn"),
        KMeans.quantize1000(col("vn")).as("vq"))
      .select(col("vec_id") +: col("vn") +: col("vq") +: (0 until pm).map(m =>
        slice(col("vq"), m * sub + 1, sub).as(s"vq_$m")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cents = KMeans.lloydTrainMulti(base,
      (0 until pm).map(m => s"vq_$m"), "vec_id", pk, sub, 2)
    base.unpersist()

    var coded = base
    (0 until pm).foreach { m =>
      coded = KMeans.assign(coded, s"vq_$m", cents(m), s"code_$m")
    }
    val enc = coded.select(col("vec_id") +: (0 until pm).map(m => col(s"code_$m")): _*)

    time("A: encode (prep + 8 assigns)") { noop(enc) }
    val encM = KMeans.assignMulti(base, "vq", cents,
        (0 until pm).map(m => s"code_$m"))
      .select(col("vec_id") +: (0 until pm).map(m => col(s"code_$m")): _*)
    time("A2: encode via assignMulti") { noop(encM) }
    time("A3: multi, no extractors") {
      noop(base.select(col("vec_id"),
        call_function("graft_lloyd_assign_multi", col("vq"),
          typedLit(cents.map(_.map(_.c.toSeq)))).as("codes")))
    }
    locally {
      import org.apache.spark.sql.execution.debug._
      val fr = base.select(col("vec_id"),
        call_function("graft_lloyd_assign_multi", col("vq"),
          typedLit(cents.map(_.map(_.c.toSeq)))).as("codes"))
      println("[p41] === A3 executedPlan ===")
      println(fr.queryExecution.executedPlan.toString.take(3000))
      println("[p41] === A3 codegen (first 6000 chars) ===")
      println(fr.queryExecution.debug.codegenToSeq()
        .map { case (subtree, code, _) => subtree + "\n" + code }
        .mkString("\n----\n").take(6000))
    }
    time("B: prep only (no assigns)") {
      noop(base.select(col("vec_id") +: (0 until pm).map(m => col(s"vq_$m")): _*))
    }
    time("B2: prep only (vq)") {
      noop(base.select(col("vec_id"), col("vq")))
    }

    val corpus = enc.persist(StorageLevel.MEMORY_AND_DISK)
    corpus.write.mode("overwrite").format("noop").save() // materialize

    val qt = base.filter(col("vec_id") % 50 === 0 && col("vec_id") < 25000)
      .select(col("vec_id").as("q_id"),
        call_function("graft_pq_adc_table", col("vn"),
          typedLit(cents.map(_.map(_.c.toSeq)))).as("adc"))
    val sim = (0 until pm).map(m =>
      element_at(col("adc"), col(s"code_$m") + lit(m * pk + 1)))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    time("C: scan from cached corpus") {
      noop(corpus.join(broadcast(qt), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id")))
    }
    time("D: scan, sim = const") {
      noop(corpus.join(broadcast(qt), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (col("code_0") * 1.0).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id")))
    }
    time("E: join only, count rows") {
      noop(corpus.join(broadcast(qt), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id")))
    }
    spark.stop()
  }
}
