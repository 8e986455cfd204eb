package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-derived signals over the event stream. A large-scale training
  * corpus routinely carries a link structure (web graph, citation
  * graph, user-interaction graph), and a PageRank-style centrality
  * score is a standard quality prior for sampling weights (the
  * reference has no graph ops; this family is part of the engine's
  * training-data surface, like the dedup/ANN families).
  *
  * All iteration arithmetic is INTEGER (micro-rank units, `div`), so
  * the result is exactly order-independent and the DuckDB oracle can
  * replay it verbatim — no float accumulation anywhere. */
object GraphQueries {
  import Tables.load

  /** Directed "handoff" edges: within each (event_type, day), order
    * events by (ts, event_id) and link each user to the next distinct
    * user. Scoping the chain to type×day keeps every window partition
    * bounded (types × days of them), so the sort parallelizes on a
    * cluster — an unbounded per-type chain would funnel the corpus
    * into a handful of sort partitions. Real deployments would supply
    * an edge table directly; the derivation here exists so the query
    * is self-contained on the fixture. */
  private def handoffEdges(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val w = Window
      .partitionBy(col("event_type"), to_date(col("ts")))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
      .withColumn("dst", lead(col("user_id"), 1).over(w))
      .filter(col("dst").isNotNull && col("dst") =!= col("user_id"))
      .select(col("user_id").as("src"), col("dst"))
      .distinct()
  }

  private val Iters = 3

  /** PageRank, 3 synchronous iterations, damping 0.85, in integer
    * micro-rank units: R0 = 1e6 per node; each round every node sends
    * `rank div outdeg` along its out-edges and collects
    * `150000 + (85 * inbound) div 100`. Dangling-node mass is dropped
    * (the standard simple variant) — mirrored identically in the
    * oracle, so the compare is exact.
    *
    * Scale: per round = one shuffle (groupBy dst) plus id-sized joins
    * against the persisted edge list; ranks/outdeg are node-sized,
    * edges edge-sized — nothing corpus-sized is ever collected or
    * broadcast. The round count is a fixed constant, so the logical
    * plan stays bounded (the Components lesson — unbounded iteration
    * needs localCheckpoint per round — doesn't bite at 3). Integer
    * overflow headroom: total mass = 1e6·|V|; ×85 stays under 2^63
    * up to ~10^11 nodes. */
  val qPagerank = Q(
    "q_pagerank",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val edges = handoffEdges(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to Iters) {
        val inbound = edges
          .join(outdeg, Seq("src"))
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
          .groupBy("node")
          .agg(sum(col("c")).as("s"))
        ranks = nodes.join(inbound, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("node").asc).limit(20)
        .select(col("node"), col("rank").as("rank_micros"))
    },
    Some {
      val seed = """seq AS (
        SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, user_id,
          lead(user_id) OVER (PARTITION BY event_type, CAST(ts AS DATE)
            ORDER BY ts, event_id) AS dst
        FROM events),
      edges AS (SELECT DISTINCT user_id AS src, dst FROM seq
        WHERE dst IS NOT NULL AND dst != user_id),
      nodes AS (SELECT src AS node FROM edges
        UNION SELECT dst FROM edges),
      outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
      // three unrolled synchronous rounds, identical integer arithmetic
      val round = (i: Int, prev: String) => s"""i$i AS (
        SELECT n.node,
          CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS s
          FROM edges e
          JOIN outdeg o ON e.src = o.src
          JOIN $prev r ON e.src = r.node
          GROUP BY 1) s ON n.node = s.node)"""
      s"""WITH $seed,
      ${round(1, "r0")},
      ${round(2, "i1")},
      ${round(3, "i2")}
      SELECT node, rank AS rank_micros FROM i3
      ORDER BY rank DESC, node ASC LIMIT 20"""
    },
    "PageRank quality prior: 3 integer-arithmetic rounds, one shuffle per round")

  val all: Seq[Q] = Seq(qPagerank)
}
