package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-13 sf10 gate extension (VERDICT r12 item 3): the remaining
  * supralinear-risk families get the P34 treatment — timed at
  * /tmp/sf1 (10x the driver gate) and /tmp/sf10 (100x), sf10 outputs
  * dumped for the DuckDB oracle compare:
  *
  *   python3 tools/check.py /tmp/sf10 /tmp/verify_sf10_wide
  *
  * Families: the full ETL parity path (q_star_fact — sf1 evidence
  * only until now), the graph iterators (q_pagerank,
  * q_label_propagation — 2.9x/decade at sf1 in r12 notes), and the
  * text hot path (q_corpus_pipeline, q_bpe_encode).
  * Fixture: tools/gen_sf1.py then tools/gen_sf10.py.
  */
object P37 {
  val names = Seq("q_star_fact", "q_pagerank", "q_label_propagation",
    "q_corpus_pipeline", "q_bpe_encode")

  def main(args: Array[String]): Unit = {
    val outRoot = "/tmp/verify_sf10_wide"
    val only = if (args.nonEmpty) args.toSet else names.toSet
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
      names.filter(only).foreach { name =>
        val t0 = System.nanoTime()
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          val rows =
            if (dir == "/tmp/sf10") {
              df.write.mode("overwrite").parquet(s"$outRoot/$name")
              spark.read.parquet(s"$outRoot/$name").count()
            } else df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-22s $dir%-10s wall $wall%8.2f s  rows $rows%10d")
        } catch { case e: Throwable =>
          nFailed += 1
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$name%-22s $dir%-10s FAILED after $wall%.1f s: " +
            e.toString.take(200))
        }
        clearState()
      }
    }
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
      .filter { case (k, _) => names.contains(k) && only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outRoot/oracle_sql.json"), json)
    spark.stop()
    // a gate that prints FAILED must not exit 0 (round-12 review)
    if (nFailed > 0) sys.exit(1)
  }
}
