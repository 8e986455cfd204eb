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

    // The production path (SCALE.md): BPE-learn operates on the WORD-TYPE
    // histogram, not the corpus — so ONE driver action (collect the
    // histogram, capped to top-1M types at real scale) replaces the
    // per-round shuffle+TakeOrdered, and the 30k-merge loop runs
    // driver-local. Measure the local loop so the s/merge figure in
    // SCALE.md is evidence.
    val hist = vocab0.collect().map(r =>
      (r.getLong(0), r.getSeq[String](1).toArray))
    val t0 = System.nanoTime()
    var wtypes = hist
    val localRounds = 3000
    var done = 0
    var continue = true
    while (done < localRounds && continue) {
      val counts = new java.util.HashMap[(String, String), Long]()
      wtypes.foreach { case (f, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.merge(k, f, _ + _); i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && (k._1 < best._1._1 ||
              (k._1 == best._1._1 && k._2 < best._1._2)))) best = (k, v)
        }
        val (a, b) = best._1
        wtypes = wtypes.map { case (f, syms) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (f, out.toArray)
        }
        done += 1
      }
    }
    val dtLoc = (System.nanoTime() - t0) / 1e9
    println(f"== driver-local: $done merges in $dtLoc%.2f s over ${hist.length} word types (${dtLoc / math.max(done, 1) * 1000}%.2f ms/merge; 1 action total) ==")
    spark.stop()
  }
}
