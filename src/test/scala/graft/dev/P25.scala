package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-10 probe: q_simjoin_prefix restructure. The class token-set
  * arrays (`hs`) already carry everything the posting-level frames
  * re-derive: n = size(hs) (replaces the per-class window COUNT and
  * the nn aggregate + its two joins), and shared = size(array_intersect
  * (hs_a, hs_b)) computed row-locally inside the SAME join that fetches
  * the roster ids for expansion (replaces the two tok verification
  * joins + groupBy). args: sfDir. */
object P25 {
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
    import graft.ops.TextOps

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

    def restructured(): DataFrame = {
      val docs = graft.Tables.load(spark, dir, "documents").repartition(col("doc_id"))
      val base = docs.select(col("doc_id"),
        TextOps.shingleHashes(TextOps.words(col("text"))).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val keyed = base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
      val (classes, megaStars) = graft.ops.ClassGuard.collapse(
        keyed, "k", "doc_id", Seq("hs"), graft.ops.ClassGuard.cap(spark))
      // n = |token set| rides the explode; no per-class window COUNT
      val tok = classes.select(col("k"), col("cls"), size(col("hs")).as("n"),
          explode(col("hs")).as("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dfc = tok.groupBy("s").agg(sum(col("cls")).as("df"))
      val wrk = Window.partitionBy("k").orderBy(col("df").asc, col("s").asc)
      val ranked = tok.join(dfc, Seq("s"))
        .select(col("k"), col("s"), col("df"), col("n"),
          row_number().over(wrk).as("rk"))
      val pref = ranked
        .filter(col("rk") <= col("n") - expr("(n*3 + 4) div 5") + 1)
        .filter(col("df") >= 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val a = pref.select(col("k").as("ka"), col("s"),
        col("n").as("na"), col("rk").as("pa"))
      val b = pref.select(col("k").as("kb"), col("s"),
        col("n").as("nb"), col("rk").as("pb"))
      val cand = a.join(b, Seq("s"))
        .filter(col("ka") < col("kb"))
        .filter(col("nb") * 5 >= col("na") * 3 && col("na") * 5 >= col("nb") * 3)
        .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= expr("(3*(na + nb) + 7) div 8"))
        .select("ka", "kb").distinct()
      // one join pair fetches sets AND rosters; shared is row-local
      val cp = cand
        .join(classes.select(col("k").as("ka"), col("hs").as("hs_a"),
          col("ids").as("ids_a")), Seq("ka"))
        .join(classes.select(col("k").as("kb"), col("hs").as("hs_b"),
          col("ids").as("ids_b")), Seq("kb"))
        .select(col("ids_a"), col("ids_b"),
          expr("graft_pair_overlap(hs_a, hs_b)").as("shared"),
          size(col("hs_a")).as("na"), size(col("hs_b")).as("nb"))
        .filter(col("shared") * 5 >= (col("na") + col("nb") - col("shared")) * 3)
        .select(col("ids_a"), col("ids_b"), col("shared"),
          round(lit(10000.0) * col("shared") / (col("na") + col("nb") - col("shared")))
            .cast("long").as("jacc_bp"))
      val cross = cp
        .select(col("shared"), col("jacc_bp"), explode(col("ids_a")).as("da"), col("ids_b"))
        .select(col("shared"), col("jacc_bp"), col("da"), explode(col("ids_b")).as("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("shared"), col("jacc_bp"))
      val intra = classes.filter(col("cls") > 1)
        .select(size(col("hs")).cast("long").as("n"), explode(col("ids")).as("da"), col("ids"))
        .select(col("n"), col("da"), explode(col("ids")).as("db"))
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      val starIntra = megaStars
        .join(classes.select(col("k"), size(col("hs")).cast("long").as("n")), Seq("k"))
        .select(col("rep").as("doc_a"), col("member").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      cross.unionByName(intra).unionByName(starIntra)
        .select("doc_a", "doc_b", "shared", "jacc_bp")
    }

    (1 to 3).foreach { pass =>
      t(f"pass $pass CURRENT") {
        noop(graft.queries.SimilarityQueries.qSimjoinPrefix.build(spark, dir))
      }
      clear()
      t(f"pass $pass RESTRUCT") { noop(restructured()) }
      clear()
    }
    println("== parity ==")
    val cur = graft.queries.SimilarityQueries.qSimjoinPrefix.build(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    clear()
    val alt = restructured().collect().map(_.toString).sorted.toSeq
    clear()
    println(s"  rows: current=${cur.size} restruct=${alt.size} equal=${cur == alt}")
    spark.stop()
  }
}
