package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: q_assoc_rules stage split — baskets materialization
  * (lineitem⋈part + distinct) vs the per-order pair self-join vs the
  * full query; and a roster variant that collects each order's sorted
  * brand set once and expands pairs row-locally. args: sfDir. */
object P26 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    graft.Tables.ensureConf(spark)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      val p = graft.Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
      val baskets = graft.Tables.load(spark, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("baskets materialize") { baskets.count() }
      val pairs = baskets.select(col("o"), col("b").as("brand_a"))
        .join(baskets.select(col("o"), col("b").as("brand_b")), Seq("o"))
        .filter(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 10)
      t("pairs (selfjoin+agg)") { noop(pairs) }
      t("FULL current") {
        clear()
        noop(graft.queries.AnalyticsQueries.qAssocRules.build(spark, dir))
      }
      clear()
      // roster variant: sort brands per order once, expand row-locally
      t("FULL roster") {
        val p2 = graft.Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
        val baskets2 = graft.Tables.load(spark, dir, "lineitem")
          .join(p2, col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val na = baskets2.groupBy("b").agg(count(lit(1)).as("n_i"))
        val tot = baskets2.agg(countDistinct(col("o")).as("n_orders"))
        val rosters = baskets2.groupBy("o")
          .agg(array_sort(collect_list(col("b"))).as("bs"))
          .filter(size(col("bs")) > 1)
        val pairs2 = rosters
          .select(posexplode(col("bs")).as(Seq("i", "brand_a")), col("bs"))
          .select(col("brand_a"), explode(slice(col("bs"), col("i") + lit(2),
            greatest(size(col("bs")) - col("i") - lit(1), lit(0)))).as("brand_b"))
          .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 10)
        val out = pairs2
          .join(broadcast(na.select(col("b").as("brand_a"), col("n_i").as("n_a"))), Seq("brand_a"))
          .join(broadcast(na.select(col("b").as("brand_b"), col("n_i").as("n_b"))), Seq("brand_b"))
          .crossJoin(broadcast(tot))
          .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
            col("n_b"), col("n_orders"),
            expr("(n_ab * 1000000) div n_a").as("conf_ppm"),
            expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000)
              div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""").as("lift_ppm"))
        noop(out)
      }
      clear()
    }
    println("== parity ==")
    def roster(): DataFrame = {
      val p2 = graft.Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
      val baskets2 = graft.Tables.load(spark, dir, "lineitem")
        .join(p2, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct()
      val na = baskets2.groupBy("b").agg(count(lit(1)).as("n_i"))
      val tot = baskets2.agg(countDistinct(col("o")).as("n_orders"))
      val rosters = baskets2.groupBy("o")
        .agg(array_sort(collect_list(col("b"))).as("bs"))
        .filter(size(col("bs")) > 1)
      val pairs2 = rosters
        .select(posexplode(col("bs")).as(Seq("i", "brand_a")), col("bs"))
        .select(col("brand_a"), explode(slice(col("bs"), col("i") + lit(2),
          greatest(size(col("bs")) - col("i") - lit(1), lit(0)))).as("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 10)
      pairs2
        .join(broadcast(na.select(col("b").as("brand_a"), col("n_i").as("n_a"))), Seq("brand_a"))
        .join(broadcast(na.select(col("b").as("brand_b"), col("n_i").as("n_b"))), Seq("brand_b"))
        .crossJoin(broadcast(tot))
        .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
          col("n_b"), col("n_orders"),
          expr("(n_ab * 1000000) div n_a").as("conf_ppm"),
          expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000)
            div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""").as("lift_ppm"))
    }
    val cur = graft.queries.AnalyticsQueries.qAssocRules.build(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    clear()
    val alt = roster().collect().map(_.toString).sorted.toSeq
    clear()
    println(s"  rows: current=${cur.size} roster=${alt.size} equal=${cur == alt}")
    spark.stop()
  }
}
