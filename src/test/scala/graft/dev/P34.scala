package graft.dev

import org.apache.spark.sql.SparkSession

/** sf10 dedup/ANN parity gate (VERDICT r11 item 4): the five headline
  * dedup/ANN-family queries whose skew cliffs (mega-class rosters,
  * chain graphs, candidate-set blowup) only appear at scale, timed at
  * /tmp/sf1 (10x the driver gate) and /tmp/sf10 (100x), with sf10
  * outputs dumped for the DuckDB oracle compare
  * (the oracle json is pre-filtered to this subset):
  *
  *   python3 tools/check.py /tmp/sf10 /tmp/verify_sf10_dedup
  *
  * Template: P19 (the streaming-six sf10 gate, carried since r6).
  * Fixture: tools/gen_sf1.py then tools/gen_sf10.py (content-perturbed
  * copies so near-dup density per doc stays at the sf0.1 rate — the
  * honest scale shape, not a 100x-clique adversarial one).
  */
object P34 {
  val names = Seq("q_dedup_apply", "q_dedup_components",
    "q_semantic_clusters", "q_knn_graph", "q_dedup_ngram_jaccard")

  def main(args: Array[String]): Unit = {
    val outRoot = "/tmp/verify_sf10_dedup"
    var nFailed = 0
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outRoot))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    Seq("/tmp/sf1", "/tmp/sf10").foreach { dir =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          val rows =
            if (dir == "/tmp/sf10") {
              df.write.mode("overwrite").parquet(s"$outRoot/$name")
              spark.read.parquet(s"$outRoot/$name").count()
            } else df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-26s $dir%-10s wall $wall%8.2f s  rows $rows%10d")
        } catch { case e: Throwable =>
          nFailed += 1
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-26s $dir%-10s FAILED after $wall%.1f s: " +
            e.toString.take(200))
        }
        clearState()
      }
    }
    // oracle json for the checker, filtered to `names` (check.py
    // iterates every entry it finds)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => names.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outRoot/oracle_sql.json"), json)
    spark.stop()
    // a gate that prints FAILED must not exit 0 (round-12 review)
    if (nFailed > 0) sys.exit(1)
  }
}
