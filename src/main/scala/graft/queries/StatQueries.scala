package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SQL-surface statistics family: the grouping-sets / reshape /
  * binning / privacy-audit operators that round out the warehouse
  * query surface beyond what the reference's five scripts exercise
  * (the reference aggregates only flat GROUP BYs —
  * etl2_advclean_and_dimcreatin.py builds dims with plain groupBy;
  * everything here is the analyst-facing layer on top).
  *
  * Conventions as everywhere in the registry: money in integer cents,
  * ratios in integer basis points, explicit deterministic tiebreaks,
  * every aggregate aliased identically in the Spark plan and the
  * DuckDB oracle.
  */
object StatQueries {
  import Tables.load

  private def cents(c: String): org.apache.spark.sql.Column =
    round(col(c) * 100).cast("long")

  /** Explicit GROUPING SETS — the general form of the cube/rollup
    * family (q_cube_agg, q_rollup_agg): a hand-picked set list
    * ((status, priority), (status), ()) plus grouping_id() so
    * consumers can tell a real NULL from an aggregated-out level.
    * Catalyst plans all sets in ONE Expand + single shuffle — same
    * cost class as the plain aggregate, not one job per set.
    * Scale: Expand multiplies rows by the number of sets (3 here)
    * before the combinable aggregate — the standard engine trade;
    * keep the set list small at fact scale. */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (spark, dir) => {
      Tables.ensureConf(spark)
      load(spark, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(cents("o_totalprice")).as("sum_cents"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n,
      CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        (o_orderstatus), ())"""),
    "GROUPING SETS with grouping_id (general grouping-sets family)")

  /** Wide→long reshape via the native Dataset.unpivot (melt) — the
    * inverse of q_pivot_status: a per-month wide layout (one column
    * per order status) unpivoted back to (month, status, n) rows.
    * unpivot is a row-local Expand — no shuffle beyond the one
    * building the wide input; the variable/value column names are
    * explicit so the schema is stable.
    * Scale: Expand ×3 on an already-aggregated (months-sized) input —
    * negligible; unpivoting a fact table instead would multiply the
    * scan, so reshape AFTER aggregating, as here. */
  val qUnpivot = Q(
    "q_unpivot",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val wide = load(spark, dir, "orders")
        .groupBy(trunc(col("o_orderdate"), "month").as("month"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("F"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("O"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("P"))
      wide.unpivot(Array(col("month")), Array(col("F"), col("O"), col("P")),
        "status", "n")
    },
    Some("""WITH wide AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f,
          SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o,
          SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p
        FROM orders GROUP BY 1)
      SELECT month, 'F' AS status, CAST(f AS BIGINT) AS n FROM wide
      UNION ALL SELECT month, 'O', CAST(o AS BIGINT) FROM wide
      UNION ALL SELECT month, 'P', CAST(p AS BIGINT) FROM wide"""),
    "Dataset.unpivot wide→long reshape (inverse of pivot)")

  /** Equi-depth binning: exact NTILE(10) deciles over order price
    * with an explicit (cents, o_orderkey) tiebreak, then per-bin
    * count/min/max/sum — the quantile-histogram every data profiler
    * emits. A bare `ntile() OVER (ORDER BY ...)` window would funnel
    * the fact table through ONE partition (Spark warns and does
    * exactly that), so the rank comes from `ops.GlobalRank`: range
    * repartition + parallel partition-local sort + k-row offset
    * action + broadcast offset join, and the decile is the closed-form
    * NTILE bucket of (global rank, total). Identical values to the
    * window form — PlanSpec pins that the plan has a range exchange
    * and NO single-partition exchange; OpsSpec differentials the rank
    * against Spark's own window ntile.
    * Scale: one range exchange + one combinable shuffle; the offsets
    * action moves k rows to the driver. */
  val qQuantileBins = Q(
    "q_quantile_bins",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val base = load(spark, dir, "orders")
        .select(col("o_orderkey"), cents("o_totalprice").as("c"))
      val parts = spark.sparkContext.defaultParallelism
      val (ranked, total) = graft.ops.GlobalRank.withGlobalRank(
        base, Seq(col("c").asc, col("o_orderkey").asc), "r", parts)
      ranked
        .withColumn("decile", graft.ops.GlobalRank.ntileFromRank(col("r"), total, 10))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), min(col("c")).as("min_cents"),
          max(col("c")).as("max_cents"), sum(col("c")).as("sum_cents"))
    },
    Some("""WITH t AS (
        SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS c,
          NTILE(10) OVER (ORDER BY CAST(round(o_totalprice*100) AS BIGINT),
            o_orderkey) AS decile
        FROM orders)
      SELECT decile, COUNT(*) AS n, MIN(c) AS min_cents, MAX(c) AS max_cents,
        CAST(SUM(c) AS BIGINT) AS sum_cents
      FROM t GROUP BY decile"""),
    "Equi-depth deciles (NTILE) with deterministic tiebreak + per-bin stats")

  /** Equi-width histogram of document length per language — the
    * fixed-bucket companion to the equi-depth bins above: bucket =
    * min(n_chars div 100, 9), so the top bucket is open-ended. One
    * combinable shuffle; bucket math is row-local integer division.
    * The (lang, bucket) grid is NOT densified — empty buckets are
    * absent, matching the SQL GROUP BY exactly (densify with
    * q_gapfill's calendar-join shape if a chart needs zeros). */
  val qHistogram = Q(
    "q_histogram",
    (spark, dir) => {
      Tables.ensureConf(spark)
      load(spark, dir, "documents")
        .select(col("lang"),
          least(floor(col("n_chars") / 100), lit(9L)).cast("int").as("bucket"),
          col("n_chars"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
    },
    Some("""SELECT lang,
      CAST(LEAST(n_chars // 100, 9) AS INTEGER) AS bucket,
      COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1, 2"""),
    "Equi-width histogram of doc length per language")

  /** k-anonymity audit — the privacy gate on a training corpus's
    * metadata (companion to q_pii_scrub, which redacts content):
    * every (nation, segment, account-balance band) quasi-identifier
    * combination is a group; groups smaller than k=5 re-identify
    * their members. Emits per-group size + meets_k plus the count of
    * at-risk rows via a window-free self-aggregate (the summary is a
    * second combinable pass over group rows, never a window over the
    * corpus). Banding c_acctbal to $1000 is itself the generalization
    * step of k-anonymization — the query both audits and demonstrates
    * the technique.
    * Scale: two combinable shuffles on the QI key (groups, then the
    * scalar summary is groups-sized). */
  val qKAnonymity = Q(
    "q_k_anonymity",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val groups = load(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("group_n"))
        .withColumn("meets_k", (col("group_n") >= 5).cast("int"))
      groups
    },
    Some("""SELECT c_nationkey, c_mktsegment,
      CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
      COUNT(*) AS group_n,
      CAST(COUNT(*) >= 5 AS INTEGER) AS meets_k
      FROM customer GROUP BY 1, 2, 3"""),
    "k-anonymity audit over quasi-identifier groups (k=5, banded balance)")

  /** Table profiling — the per-column summary every warehouse
    * profiler emits (count / nulls / exact distinct / min / max), one
    * row per column. Built as one aggregate branch PER COLUMN unioned
    * together, deliberately NOT one aggregate with six countDistincts:
    * multi-distinct in a single aggregate plans an Expand that
    * multiplies the fact scan by the column count, while per-column
    * branches each read exactly ONE parquet column (PlanSpec pins the
    * pruned ReadSchema) and aggregate combinably. At 100 TB you would
    * swap exact distinct for the q_hll_rollup sketch; exact is the
    * oracle shape. min/max are emitted as ISO strings of exact types
    * (longs, date) — never float formatting, which differs across
    * engines. NULLs are seeded on a mod-prime slice so the null
    * counter is proven live. */
  val qTableProfile = Q(
    "q_table_profile",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val o = load(spark, dir, "orders")
        .withColumn("o_custkey",
          when(pmod(col("o_orderkey"), lit(89)) === 0, lit(null))
            .otherwise(col("o_custkey")))
      def profile(c: String, expr0: org.apache.spark.sql.Column) =
        o.select(expr0.as("v"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).cast("string").as("min_value"),
            max(col("v")).cast("string").as("max_value"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      profile("o_orderkey", col("o_orderkey"))
        .unionByName(profile("o_custkey", col("o_custkey")))
        .unionByName(profile("o_orderstatus", col("o_orderstatus")))
        .unionByName(profile("o_orderpriority", col("o_orderpriority")))
        .unionByName(profile("price_cents", cents("o_totalprice")))
        .unionByName(profile("o_day", to_date(col("o_orderdate"))))
    },
    Some("""WITH o AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
          o_orderstatus, o_orderpriority,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
          CAST(o_orderdate AS DATE) AS o_day
        FROM orders)
      SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        COUNT(DISTINCT o_orderkey) AS n_distinct,
        CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
        CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM o
      UNION ALL SELECT 'o_custkey', COUNT(*),
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        COUNT(DISTINCT o_custkey),
        CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM o
      UNION ALL SELECT 'o_orderstatus', COUNT(*),
        CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        COUNT(DISTINCT o_orderstatus),
        MIN(o_orderstatus), MAX(o_orderstatus) FROM o
      UNION ALL SELECT 'o_orderpriority', COUNT(*),
        CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        COUNT(DISTINCT o_orderpriority),
        MIN(o_orderpriority), MAX(o_orderpriority) FROM o
      UNION ALL SELECT 'price_cents', COUNT(*),
        CAST(SUM(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        COUNT(DISTINCT price_cents),
        CAST(MIN(price_cents) AS VARCHAR), CAST(MAX(price_cents) AS VARCHAR) FROM o
      UNION ALL SELECT 'o_day', COUNT(*),
        CAST(SUM(CASE WHEN o_day IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        COUNT(DISTINCT o_day),
        CAST(MIN(o_day) AS VARCHAR), CAST(MAX(o_day) AS VARCHAR) FROM o"""),
    "Per-column table profile: count/nulls/distinct/min/max, pruned scans")

  val all: Seq[Q] = Seq(qGroupingSets, qUnpivot, qQuantileBins, qHistogram,
    qKAnonymity, qTableProfile)
}
