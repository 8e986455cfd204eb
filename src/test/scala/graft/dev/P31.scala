package graft.dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-11 probe: q_star_fact cost attribution inside Etl1.stage's
  * post-window projection chain (P30 found stage+keyed ~10 s of the
  * 13.5 s sf1 wall; the r10 fuzzy-block theory was wrong — resolve is
  * ~1 s). Variants:
  *   a. baseline full Etl1.stage
  *   b. stage minus the two parseDate columns (dates replaced by a
  *      constant) — attributes the multi-format LEGACY parse
  *   c. stage with parseDate's `cleaned` normalization materialized as
  *      stacked columns (hand-CSE) before the shape dispatch
  *   d. keyed stage persisted (columnar) vs localCheckpoint (rows)
  * args: sfDir [passes]. */
object P31 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
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
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    import graft.queries.StarQueries.rawSynth
    import graft.pipeline.{Etl1, Etl2}

    // ---- replicated Etl1.stage with pluggable date step ----
    def cleanedOf(c: Column): Column = regexp_replace(
      trim(regexp_replace(c.cast("string"), "[^\\d/.\\-]", "")), "[\\.\\-]", "/")
    def dispatch(cleaned: Column): Column =
      when(cleaned.rlike("^\\d{2}/\\d{2}/\\d{4}$"), to_date(cleaned, "dd/MM/yyyy"))
        .when(cleaned.rlike("^\\d{2}/\\d{2}/\\d{2}$"), to_date(cleaned, "dd/MM/yy"))
        .when(cleaned.rlike("^\\d{4}/\\d{2}/\\d{2}$"), to_date(cleaned, "yyyy/MM/dd"))
        .otherwise(lit(null).cast("date"))

    def stageVariant(raw: DataFrame, dates: String): DataFrame = {
      val cleaned = raw.withColumn("makerName",
        regexp_replace(col("makerName"), "[\\\\.,]+$", ""))
      val w = Window.partitionBy("tempRegistrationNumber")
        .orderBy(col("fromdate").desc, col("todate").desc, col("slno").asc)
      val deduped = cleaned
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val officeLike = col("fromdate").cast("string").rlike(Etl1.OfficePattern)
      val repaired = deduped
        .withColumn("OfficeCd",
          when(officeLike && col("OfficeCd").isNull, col("fromdate"))
            .otherwise(col("OfficeCd")))
        .withColumn("fromdate",
          when(col("fromdate").cast("string").rlike(Etl1.OfficePattern),
            lit(null).cast("string")).otherwise(col("fromdate")))
        .withColumn("OfficeCd",
          when(col("OfficeCd").rlike(Etl1.StateCodePattern), lit(null))
            .otherwise(col("OfficeCd")))
        .withColumn("OfficeCd",
          when(col("OfficeCd").isNull && col("fromdate").isNotNull, col("fromdate"))
            .otherwise(col("OfficeCd")))
      val modeled = repaired
        .withColumn("modelDescClean",
          trim(regexp_replace(col("modelDesc"), "[^A-Za-z0-9\\s\\+\\-\\(\\)\\./]", " ")))
        .withColumn("isTrailer", lower(col("modelDescClean")).rlike(Etl1.TrailerPattern))
        .withColumn("isElectric", lower(col("modelDescClean")).rlike(Etl1.ElectricPattern))
        .withColumn("modelWords", split(col("modelDescClean"), "\\s+"))
        .withColumn("modelName",
          upper(when(col("isTrailer"), col("modelDescClean"))
            .otherwise(col("modelWords").getItem(0))))
        .withColumn("variant_words",
          slice(col("modelWords"), lit(2), size(col("modelWords")) - 1))
        .withColumn("variant",
          upper(when(col("isTrailer"), lit("TRAILER/TIPPER/TRACTOR/TANKER"))
            .otherwise(trim(concat_ws(" ", col("variant_words"))))))
        .withColumn("variant",
          when(col("variant") === "" || col("variant").isNull, lit("UNKNOWN"))
            .otherwise(col("variant")))
      def fastDispatch(cleaned: Column): Column = {
        def i(pos: Int, len: Int) = substring(cleaned, pos, len).cast("int")
        val fastDmy = make_date(i(7, 4), i(4, 2), i(1, 2))
        val fastYmd = make_date(i(1, 4), i(6, 2), i(9, 2))
        when(cleaned.rlike("^\\d{2}/\\d{2}/\\d{4}$"),
            when(i(7, 4) > 1582 && fastDmy.isNotNull, fastDmy)
              .otherwise(to_date(cleaned, "dd/MM/yyyy")))
          .when(cleaned.rlike("^\\d{2}/\\d{2}/\\d{2}$"), to_date(cleaned, "dd/MM/yy"))
          .when(cleaned.rlike("^\\d{4}/\\d{2}/\\d{2}$"),
            when(i(1, 4) > 1582 && fastYmd.isNotNull, fastYmd)
              .otherwise(to_date(cleaned, "yyyy/MM/dd")))
          .otherwise(lit(null).cast("date"))
      }
      val dated = dates match {
        case "none" => modeled
          .withColumn("fromdate_parsed", to_date(lit("2001-01-01")))
          .withColumn("todate_parsed", to_date(lit("2006-01-01")))
        case "cse" => modeled
          .withColumn("__fc", cleanedOf(col("fromdate")))
          .withColumn("__tc", cleanedOf(col("todate")))
          .withColumn("fromdate_parsed", dispatch(col("__fc")))
          .withColumn("todate_parsed", dispatch(col("__tc")))
          .drop("__fc", "__tc")
        case "fastcse" => modeled
          .withColumn("__fc", cleanedOf(col("fromdate")))
          .withColumn("__tc", cleanedOf(col("todate")))
          .withColumn("fromdate_parsed", fastDispatch(col("__fc")))
          .withColumn("todate_parsed", fastDispatch(col("__tc")))
          .drop("__fc", "__tc")
        case _ => modeled
          .withColumn("fromdate_parsed", dispatch(cleanedOf(col("fromdate"))))
          .withColumn("todate_parsed", dispatch(cleanedOf(col("todate"))))
      }
      val typed = dated
        .withColumn("fuel_clean",
          upper(when(col("fuel").rlike("BATTERY|ELECTRIC"), lit("ELECTRIC"))
            .when(col("fuel").rlike("PETROL|GASOLINE"), lit("PETROL"))
            .when(col("fuel").rlike("DIESEL"), lit("DIESEL"))
            .when(col("fuel").rlike("CNG"), lit("CNG"))
            .when(col("fuel").rlike("LPG"), lit("LPG"))
            .otherwise(lit("UNKNOWN"))))
        .withColumn("makeYear_inferred",
          regexp_extract(col("modelDescClean"), "(19\\d{2}|20[0-2]\\d)", 0))
        .withColumn("makeYear",
          when(col("makeYear").isNull || col("makeYear") === "" ||
            col("makeYear") === "UNKNOWN",
            when(col("makeYear_inferred") =!= "", col("makeYear_inferred"))
              .otherwise(lit("UNKNOWN")))
            .otherwise(col("makeYear")))
        .drop("makeYear_inferred")
      typed
        .withColumn("year", year(col("fromdate_parsed")))
        .withColumn("month", month(col("fromdate_parsed")))
        .filter(col("fromdate_parsed").isNotNull &&
          col("year").isNotNull && col("month").isNotNull)
    }

    (1 to passes).foreach { p =>
      println(s"== pass $p ==")
      t("old inline to_date")(noop(stageVariant(rawSynth(spark, dir), "old")))
      t("fast inline (Etl1 now)")(noop(Etl1.stage(rawSynth(spark, dir))))
      t("old stacked (cse)")(noop(stageVariant(rawSynth(spark, dir), "cse")))
      t("fast stacked (fastcse)")(noop(stageVariant(rawSynth(spark, dir), "fastcse")))
      t("dates const floor")(noop(stageVariant(rawSynth(spark, dir), "none")))
      clear()
    }
    spark.stop()
  }
}
