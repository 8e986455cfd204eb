package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe (VERDICT r12 item 6): the BPE-learn driver-
  * sequential bound. Each merge round is ONE driver action (pair-count
  * shuffle + TakeOrdered(1)) whose input is the VOCAB histogram, plus
  * a row-local fold re-projection — so a production 30k-merge
  * vocabulary is 30k sequential actions. This measures the per-round
  * action latency on the sf1 vocab (50k docs -> ~vocab-sized frame)
  * over more rounds than the graded query's 3, so the extrapolation
  * (rounds x s/round) is evidence, not guesswork.
  * args: sfDir (default /tmp/sf1), rounds (default 10).
  */
object P38 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.TextOps.words

    val vocab0 = graft.Tables.load(spark, dir, "documents")
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), expr("filter(split(word, ''), x -> x <> '')").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"== vocab: ${vocab0.count()} words ==")

    var cur = vocab0
    var sumS = 0.0
    (1 to rounds).foreach { r =>
      val t0 = System.nanoTime()
      val win = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(expr("sequence(1, size(syms) - 1)")).as("i"))
        .select(element_at(col("syms"), col("i")).as("a"),
          element_at(col("syms"), col("i") + 1).as("b"), col("freq"))
        .groupBy("a", "b").agg(sum(col("freq")).cast("long").as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()(0)
      val (a, b) = (win.getString(0), win.getString(1))
      val dt = (System.nanoTime() - t0) / 1e9
      if (r > 2) sumS += dt // rounds 1-2 absorb codegen/JIT
      println(f"round $r%-3d merge ('$a','$b') n=${win.getLong(2)}%-9d wall $dt%6.3f s")
      // NOTE: unlike q_bpe_learn, the re-projection below stacks one
      // fold per round on an UNCHECKPOINTED lineage — fine for 10
      // probe rounds; a real 30k-merge loop checkpoints periodically
      // (the Components lesson).
      cur = cur.select(col("freq"),
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), x))))
            .otherwise(concat(acc, array(x)))).as("syms"))
    }
    val perRound = sumS / (rounds - 2)
    println(f"== steady-state ${perRound}%.3f s/round; 30k merges = ${perRound * 30000 / 3600}%.1f h sequential ==")
    spark.stop()
  }
}
