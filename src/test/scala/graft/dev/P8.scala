package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug probe: which column types get parquet row-group skipping? */
object P8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")

    def measure(tag: String, path: String, pred: org.apache.spark.sql.Column): Unit = {
      val df = spark.read.parquet(path).filter(pred).select(col("o_orderkey"))
      df.collect()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      println(s"$tag pushed=${scan.metadata.get("PushedFilters")} rows=${scan.metrics("numOutputRows").value}")
    }

    // timestamp layout
    o.repartitionByRange(8, col("o_orderdate")).sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet("/tmp/p8_ts")
    measure("ts  ", "/tmp/p8_ts",
      col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31")))

    // date layout
    o.withColumn("o_date", to_date(col("o_orderdate")))
      .repartitionByRange(8, col("o_date")).sortWithinPartitions(col("o_date"))
      .write.mode("overwrite").parquet("/tmp/p8_date")
    measure("date", "/tmp/p8_date",
      col("o_date").between(lit("1996-01-01"), lit("1996-12-31")))

    // long layout
    o.withColumn("o_key2", col("o_orderkey"))
      .repartitionByRange(8, col("o_key2")).sortWithinPartitions(col("o_key2"))
      .write.mode("overwrite").parquet("/tmp/p8_long")
    measure("long", "/tmp/p8_long",
      col("o_key2").between(lit(100L), lit(2000L)))
    spark.stop()
  }
}
