package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance over an order/observation stream
  * projected to (o_custkey, o_orderkey, d DATE, st) — the history
  * build, and the INCREMENTAL fold that advances a built history by
  * one update batch without re-reading old facts.
  *
  * Everything here is entity-local (a customer's versions depend only
  * on that customer's rows) — the property that makes incremental
  * maintenance sound, and the reason the whole build plans as ONE
  * exchange (every step keys on o_custkey or a superset).
  *
  * History schema: o_custkey, version (1..k contiguous),
  * o_orderstatus, valid_from, valid_to (null = open), is_current,
  * n_orders (orders inside the version's run). */
object Scd2 {
  /** Full gaps-and-islands build: change flag → running-sum run id →
    * per-run aggregate → lead() for the closing date. */
  def history(o: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("d"), col("o_orderkey"))
    val runs = o
      .withColumn("chg",
        when(lag(col("st"), 1).over(w).isNull
          || lag(col("st"), 1).over(w) =!= col("st"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(w))
      .groupBy(col("o_custkey"), col("run_id"))
      .agg(min(col("st")).as("o_orderstatus"),
        min(col("d")).as("valid_from"),
        count(lit(1)).as("n_orders"))
    finishRuns(runs.withColumn("version", col("run_id")))
  }

  /** Advance `hist` by `batch` — from the HISTORY ROWS AND THE BATCH
    * ONLY (old facts are never re-read; this is the operational
    * contract a warehouse merge actually has).
    *
    * Requires every batch date to be strictly later than the affected
    * customers' open-version valid_from — i.e. batches arrive in date
    * order, the same assumption every incremental warehouse load
    * makes.
    *
    * Mechanics: an affected customer's OPEN row re-enters the
    * gaps-and-islands as one pseudo-order carrying its accumulated
    * n_orders as WEIGHT (date = valid_from, which sorts before every
    * batch row); closed rows and untouched customers pass through.
    * Version numbering resumes at the open row's version. A batch
    * whose first status equals the open row's extends that run —
    * producing exactly what a from-scratch rebuild would, which
    * q_scd2_fold's oracle (the full rebuild) hash-proves each round.
    *
    * Scale: the batch keyset is batch-sized → broadcast anti/semi
    * joins; the islands window runs over (affected open rows +
    * batch), i.e. work tracks the BATCH, not the dimension. */
  def fold(hist: DataFrame, batch: DataFrame): DataFrame = {
    val affected = batch.select("o_custkey").distinct()
    val untouched = hist.join(broadcast(affected), Seq("o_custkey"), "left_anti")
    val affHist = hist.join(broadcast(affected), Seq("o_custkey"), "left_semi")
    val closed = affHist.filter(!col("is_current"))
    val open = affHist.filter(col("is_current"))
    val pseudo = open.select(col("o_custkey"), lit(-1L).as("o_orderkey"),
      col("valid_from").as("d"), col("o_orderstatus").as("st"),
      col("n_orders").as("wt"))
    val baseV = open.select(col("o_custkey"), col("version").as("base_version"))
    val rows = pseudo.unionByName(
      batch.select(col("o_custkey"), col("o_orderkey"), col("d"), col("st"),
        lit(1L).as("wt")))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("d"), col("o_orderkey"))
    val runs = rows
      .withColumn("chg",
        when(lag(col("st"), 1).over(w).isNull
          || lag(col("st"), 1).over(w) =!= col("st"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(w))
      .groupBy(col("o_custkey"), col("run_id"))
      .agg(min(col("st")).as("o_orderstatus"),
        min(col("d")).as("valid_from"),
        sum(col("wt")).as("n_orders"))
      // base_version is per-affected-customer — batch-sized, broadcast
      .join(broadcast(baseV), Seq("o_custkey"), "left")
      .withColumn("version",
        col("run_id") + coalesce(col("base_version"), lit(1L)) - 1L)
    closed.unionByName(finishRuns(runs)).unionByName(untouched)
  }

  /** Shared tail: valid_to = next version's valid_from (lead), open
    * row flagged is_current. `runs` must carry version + the aggregate
    * columns. */
  private def finishRuns(runs: DataFrame): DataFrame = {
    val wv = Window.partitionBy("o_custkey").orderBy("version")
    runs.select(col("o_custkey"), col("version"),
      col("o_orderstatus"), col("valid_from"),
      lead(col("valid_from"), 1).over(wv).as("valid_to"),
      lead(col("valid_from"), 1).over(wv).isNull.as("is_current"),
      col("n_orders"))
  }
}
