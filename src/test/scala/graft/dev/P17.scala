package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Interleaved A/B/C decomposition of the residual ClassGuard
  * overhead VERDICT r8 measured on q_dedup_containment (~1.56x r6)
  * and q_dedup_simhash (~1.40x r6):
  *
  *   A — the r6 unguarded plan (git 197c3ad), plain collect_list agg,
  *       lazily materialized.
  *   B — the current registered query (CappedRoster + eager mega-key
  *       collect + statically-empty star).
  *   C — CappedRoster + capped/rep projection but NO eager collect and
  *       NO star branch: isolates "the native aggregate costs more
  *       than collect_list" from "the eager materialization job costs
  *       a cache round-trip".
  *
  * A,B,C alternate pass by pass in one JVM so host drift cancels.
  */
object P17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)
    import graft.ops.TextOps._

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // CappedRoster collapse WITHOUT the eager mega-key collect/star
    def collapseC(members: DataFrame, keyCol: String, idCol: String,
        payload: Seq[String], capSize: Int): DataFrame = {
      val firsts = payload.map(c => first(col(c)).as(c))
      val agged = members.groupBy(keyCol)
        .agg(call_function("graft_capped_roster",
          col(idCol), lit(capSize)).as("_cr"), firsts: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      agged.select((col(keyCol) +:
        when(col("_cr.cls") <= capSize, col("_cr.ids"))
          .otherwise(array(col("_cr.rep"))).as("ids") +:
        payload.map(col)) :+ col("_cr.cls").as("cls"): _*)
    }

    // ---------------- simhash ----------------
    def simhashFrom(sigs: DataFrame): DataFrame = {
      val bands = sigs.select(col("sim"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("band"),
            shiftright(col("sim"), 15 * j).bitwiseAND(lit(32767L))
              .as("bkey"))): _*)).as("b"))
        .select(col("sim"), col("b.band"), col("b.bkey"))
      val sigPairs = bands.select(col("sim").as("sim_a"), col("band"), col("bkey"))
        .join(bands.select(col("sim").as("sim_b"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .filter(col("sim_a") < col("sim_b"))
        .select("sim_a", "sim_b").distinct()
        .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
        .filter(col("hamming") <= 3)
      val cross = sigPairs
        .join(sigs.select(col("sim").as("sim_a"), col("ids").as("ids_a")), Seq("sim_a"))
        .join(sigs.select(col("sim").as("sim_b"), col("ids").as("ids_b")), Seq("sim_b"))
        .select(col("sim_a"), col("sim_b"), col("hamming"),
          explode(col("ids_a")).as("da"), col("ids_b"))
        .select(col("sim_a"), col("sim_b"), col("hamming"), col("da"),
          explode(col("ids_b")).as("db"))
        .select(
          least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          when(col("da") < col("db"), col("sim_a")).otherwise(col("sim_b")).as("sim_a"),
          when(col("da") < col("db"), col("sim_b")).otherwise(col("sim_a")).as("sim_b"),
          col("hamming"))
      val intra = sigs.filter(size(col("ids")) > 1)
        .select(col("sim"), explode(col("ids")).as("da"), col("ids"))
        .select(col("sim"), col("da"), explode(col("ids")).as("db"))
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("sim").as("sim_a"), col("sim").as("sim_b"),
          lit(0).as("hamming"))
      cross.unionByName(intra)
        .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"),
          col("hamming").cast("int").as("hamming"))
    }
    def simhashBase(): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
      d.select(col("doc_id"),
        simhash60Native(wordHashes60(words(col("text")))).as("sim"))
    }
    def simhashA(): DataFrame = {
      val sigs = simhashBase().groupBy("sim")
        .agg(collect_list(col("doc_id")).as("ids"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      simhashFrom(sigs)
    }
    def simhashC(): DataFrame = {
      val sigs = collapseC(simhashBase().filter(col("sim").isNotNull),
        "sim", "doc_id", Seq(), graft.ops.ClassGuard.cap(spark))
      simhashFrom(sigs)
    }

    // ---------------- containment ----------------
    def contFrom(classes: DataFrame): DataFrame = {
      val DfCap = 1000
      val ex = classes.select(col("k"), col("cls"), explode(col("hs")).as("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hot = ex.groupBy("s").agg(sum(col("cls")).as("df"))
        .filter(col("df") > DfCap).select("s")
      val idx = ex.join(broadcast(hot), Seq("s"), "left_anti")
        .select("k", "s")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nn = idx.groupBy("k").agg(count(lit(1)).as("n"))
      val shared = idx.select(col("k").as("ka"), col("s"))
        .join(idx.select(col("k").as("kb"), col("s")), Seq("s"))
        .filter(col("ka") < col("kb"))
        .groupBy("ka", "kb").agg(count(lit(1)).as("shared"))
      val both = shared.select(explode(array(
          struct(col("ka").as("kin"), col("kb").as("kof"),
            col("shared").as("shared")),
          struct(col("kb").as("kin"), col("ka").as("kof"),
            col("shared").as("shared")))).as("e"))
        .select(col("e.kin").as("kin"), col("e.kof").as("kof"),
          col("e.shared").as("shared"))
      val cp = both
        .join(nn.select(col("k").as("kin"), col("n").as("n_in")), Seq("kin"))
        .withColumn("cont_bp",
          round(lit(10000.0) * col("shared") / col("n_in")).cast("long"))
        .filter(col("cont_bp") >= 8000)
      val cross = cp
        .join(classes.select(col("k").as("kin"), col("ids").as("ids_in")), Seq("kin"))
        .join(classes.select(col("k").as("kof"), col("ids").as("ids_of")), Seq("kof"))
        .select(col("shared"), col("n_in"), col("cont_bp"),
          explode(col("ids_in")).as("doc_in"), col("ids_of"))
        .select(col("shared"), col("n_in"), col("cont_bp"), col("doc_in"),
          explode(col("ids_of")).as("doc_of"))
      val intra = classes.filter(col("cls") > 1)
        .join(nn, Seq("k"))
        .select(col("n"), explode(col("ids")).as("doc_in"), col("ids"))
        .select(col("n"), col("doc_in"), explode(col("ids")).as("doc_of"))
        .filter(col("doc_in") =!= col("doc_of"))
        .select(col("doc_in"), col("doc_of"), col("n").as("shared"),
          col("n").as("n_in"), lit(10000L).as("cont_bp"))
      cross.select("doc_in", "doc_of", "shared", "n_in", "cont_bp")
        .unionByName(intra)
    }
    def contKeyed(): DataFrame = {
      val d0 = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("text"))
      val excerpts = d0.filter(col("doc_id") % 17 === 0)
        .select((-col("doc_id") - 1).as("doc_id"),
          array_join(slice(words(col("text")), lit(1),
            greatest(ceil(size(words(col("text"))) * 0.4), lit(5))
              .cast("int")), " ").as("text"))
      val d = d0.unionByName(excerpts)
      val base = d.select(col("doc_id"),
        shingleHashes(words(col("text"))).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
    }
    def contA(): DataFrame = {
      val classes = contKeyed().groupBy("k")
        .agg(collect_list(col("doc_id")).as("ids"),
          first(col("hs")).as("hs"), count(lit(1)).as("cls"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      contFrom(classes)
    }
    def contC(): DataFrame = {
      val classes = collapseC(contKeyed(), "k", "doc_id", Seq("hs"),
        graft.ops.ClassGuard.cap(spark))
      contFrom(classes)
    }

    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    def stats(x: Seq[Double]) =
      f"median ${x.sorted.apply(x.size / 2)}%6.2f  min ${x.min}%6.2f  all ${x.map(v => f"$v%.2f").mkString(",")}"

    // D: r6 collect_list but WITH the r7 NULL-sig filter — isolates
    //    the filter cost from the aggregate swap.
    // E: CappedRoster with the raw roster used directly (no when/cap
    //    projection, no star) — isolates the pure aggregate cost.
    def simhashD(): DataFrame = {
      val sigs = simhashBase().filter(col("sim").isNotNull).groupBy("sim")
        .agg(collect_list(col("doc_id")).as("ids"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      simhashFrom(sigs)
    }
    def simhashE(): DataFrame = {
      val sigs = simhashBase().filter(col("sim").isNotNull).groupBy("sim")
        .agg(call_function("graft_capped_roster",
          col("doc_id"), lit(graft.ops.ClassGuard.cap(spark))).as("_cr"))
        .select(col("sim"), col("_cr.ids").as("ids"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      simhashFrom(sigs)
    }

    Seq(
      ("simhash", Seq(
        "A r6-plain      " -> (() => simhashA()),
        "B current-guard " -> (() => graft.SparkEntry.queries(
          "q_dedup_simhash")(spark, dir)),
        "C agg-no-collect" -> (() => simhashC()),
        "D r6+nullfilter " -> (() => simhashD()),
        "E roster-direct " -> (() => simhashE()))),
      ("containment", Seq(
        "A r6-plain      " -> (() => contA()),
        "B current-guard " -> (() => graft.SparkEntry.queries(
          "q_dedup_containment")(spark, dir)),
        "C agg-no-collect" -> (() => contC())))
    ).foreach { case (label, variants) =>
      variants.foreach { case (_, f) => run(f()) } // warmup
      val n = 5
      val buf = variants.map(v => v._1 -> collection.mutable.ArrayBuffer[Double]())
      (1 to n).foreach { _ =>
        variants.zip(buf).foreach { case ((_, f), (_, b)) => b += run(f()) }
      }
      println(s"== $label ==")
      buf.foreach { case (lbl, xs) => println(s"$lbl " + stats(xs.toSeq)) }
    }
    spark.stop()
  }
}
