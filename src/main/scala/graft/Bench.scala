package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Several dedup/resolution queries persist() their self-joined
    // input; dropping those blocks between queries keeps one query's
    // cache from GC-pressuring the next (r1: a 28 s q_fact_assembly
    // anomaly right after the biggest persisting query).
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // Fixed-work CPU probe: the host has documented steal stalls, and a
    // single graded bench run can land in one. The probe times an
    // identical single-thread workload at start and end; a quiet host
    // reads a stable value, a stalled window reads 10-30x higher, so
    // the JSON carries evidence either way.
    def calibMs(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        var x = 0L; var i = 0
        while (i < 20000000) { x += i * 2654435761L; i += 1 }
        if (x == 42L) println(x) // defeat dead-code elimination
        (System.nanoTime() - t0) / 1e6
      }
      once(); Seq(once(), once(), once()).sorted.apply(1)
    }
    val calibStart = calibMs()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Execute the FULL plan and discard rows: count() would let the
    // optimizer prune every projection not needed to count (a pure
    // derivation query would time as a bare scan); the noop sink
    // materializes every output column.
    def runFully(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    // Untimed warmup: JIT/codegen compile + parquet footer caches. The
    // timed passes then measure steady-state plan execution, which is
    // what extrapolates to a long-lived cluster job.
    names.foreach { name =>
      try runFully(name)
      catch { case _: Throwable => () }
      clearState()
    }
    // timed passes per query, report the median: the host has
    // documented CPU-steal stalls, so a single pass can read 10-30x
    // slow; the median of back-to-back runs rejects one-off stalls.
    // 5, not 3: the host's steal stalls can blow 1-2 consecutive
    // passes; a median of 5 rejects two outliers (observed: a 0.7 s
    // query reading 6.9 s for a whole 3-pass window)
    val passes = 5
    // A failing query must NOT flatter the total as a ~0 s timing: its
    // entry is reported as -1 and its name listed in "failed".
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val timings: Map[String, Seq[Double]] = names.map { name =>
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { runFully(name); true }
          catch { case _: Throwable => failed += name; false }
        val dt = (System.nanoTime() - t0) / 1e9
        clearState()
        if (ok) dt else -1.0
      }
      name -> ts.sorted
    }.toMap
    // A query with ANY failed pass is reported as -1 and excluded from
    // every total — a partially-failing query must not contribute a
    // fastest-surviving-pass median to the sum (ts is sorted, so a
    // failure anywhere surfaces as ts.head < 0).
    val med = timings.map { case (k, ts) =>
      k -> (if (ts.head < 0) -1.0 else ts(passes / 2)) }
    val qs = med.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def totalOf(pick: Seq[Double] => Double): Double =
      timings.values.filter(_.head >= 0).map(pick).sum
    val total = totalOf(_.apply(passes / 2))
    val minTotal = totalOf(_.head)
    val maxTotal = totalOf(_.last)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibEnd = calibMs()
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"failed":$failedJson,"min_total":$minTotal,"max_total":$maxTotal,"calib_ms_start":$calibStart,"calib_ms_end":$calibEnd,"note":"per-query median of $passes passes (-1 = any pass failed, query excluded from all totals, named in failed); host has CPU-steal stalls (min_total vs max_total shows spread; calib_ms_* time identical fixed work, ~equal on a quiet host, 10-30x apart under steal)"}"""
    println(json)
    // The driver captures stdout with a bounded tail, which truncated
    // 18 of 69 per-query rows in round 2 — the full report also goes
    // to a file so no artifact consumer depends on tail capture.
    val reportPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_report.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(reportPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] report write failed: ${e.getMessage}") }
    spark.stop()
  }
}
