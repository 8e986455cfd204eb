package graft.dev

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump .explain("formatted") for queries to an output dir (the
  * plans/r13 deliverable). Usage:
  *   Test/runMain graft.dev.Plans <sfDir> <outDir> <suffix> [names...]
  * With no names, dumps every registered query. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = Paths.get(args(1))
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(out)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plans] FAIL $name: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
