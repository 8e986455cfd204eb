package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: where does ngramJaccardPairs spend its ~1.3 s at
  * sf0.1, and does a FUSED index shape win? The fused variant replaces
  * hot-groupBy + broadcast-anti-join + idx-persist + idx-self-join with
  * ONE groupBy(s) capped-roster aggregation (graft_capped_roster, cap =
  * DfCap — any roster overflow implies df > DfCap, which the filter
  * drops anyway) whose sorted rosters expand row-locally to ordered
  * class pairs via posexplode+slice. args: sfDir. */
object P23 {
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
    import graft.ops.TextOps.{words, shingleHashes}

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

    val DfCap = 1000

    def fused(): DataFrame = {
      val d = graft.Tables.load(spark, dir, "documents").repartition(col("doc_id"))
      val base = d.select(col("doc_id"), shingleHashes(words(col("text"))).as("hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keyed = base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
      val (classes, megaStars) = graft.ops.ClassGuard.collapse(
        keyed, "k", "doc_id", Seq("hs"), graft.ops.ClassGuard.cap(spark))
      val ex = classes.select(col("k"), col("cls"), explode(col("hs")).as("s"))
      val sAgg = ex.groupBy("s").agg(
          expr(s"graft_capped_roster(k, $DfCap)").as("r"),
          sum(col("cls")).as("df"))
        .filter(col("df") <= DfCap)
        .select(array_sort(col("r.ids")).as("ks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nn = sAgg.select(explode(col("ks")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val shared = sAgg
        .select(posexplode(col("ks")).as(Seq("i", "ka")), col("ks"))
        .select(col("ka"), explode(slice(col("ks"), col("i") + lit(2),
          greatest(size(col("ks")) - col("i") - lit(1), lit(0)))).as("kb"))
        .groupBy("ka", "kb").agg(count(lit(1)).as("shared"))
      val cp = shared
        .join(nn.select(col("k").as("ka"), col("n").as("na")), Seq("ka"))
        .join(nn.select(col("k").as("kb"), col("n").as("nb")), Seq("kb"))
        .withColumn("jacc_bp",
          round(lit(10000.0) * col("shared") / (col("na") + col("nb") - col("shared")))
            .cast("long"))
        .filter(col("jacc_bp") >= 2000)
      val cross = cp
        .join(classes.select(col("k").as("ka"), col("ids").as("ids_a")), Seq("ka"))
        .join(classes.select(col("k").as("kb"), col("ids").as("ids_b")), Seq("kb"))
        .select(col("shared"), col("jacc_bp"), explode(col("ids_a")).as("da"), col("ids_b"))
        .select(col("shared"), col("jacc_bp"), col("da"), explode(col("ids_b")).as("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("shared"), col("jacc_bp"))
      val intra = classes.filter(col("cls") > 1)
        .join(nn, Seq("k"))
        .select(col("n"), explode(col("ids")).as("da"), col("ids"))
        .select(col("n"), col("da"), explode(col("ids")).as("db"))
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      val starIntra = megaStars.join(nn, Seq("k"))
        .select(col("rep").as("doc_a"), col("member").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      cross.unionByName(intra).unionByName(starIntra)
        .select("doc_a", "doc_b", "shared", "jacc_bp")
    }

    (1 to 3).foreach { pass =>
      t(f"pass $pass CURRENT") {
        noop(graft.queries.TextQueries.qDedupNgramJaccard.build(spark, dir))
      }
      clear()
      t(f"pass $pass FUSED  ") { noop(fused()) }
      clear()
    }

    println("== parity check (sorted collect) ==")
    val cur = graft.queries.TextQueries.qDedupNgramJaccard.build(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    clear()
    val fus = fused().collect().map(_.toString).sorted.toSeq
    clear()
    println(s"  rows: current=${cur.size} fused=${fus.size} equal=${cur == fus}")
    spark.stop()
  }
}
