package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mega-class escape hatch for the class-collapse dedup family
  * (round-7; VERDICT r6 "next round" item 2).
  *
  * The round-6 class-collapse rewrites (jaccard / containment /
  * simjoin / simhash) run their pair pipelines at distinct-class
  * cardinality and expand class pairs back to doc pairs through
  * per-class `collect_list(doc_id)` rosters. That is the right shape
  * for organic duplication (largest class at sf10: 778 docs), but a
  * 100 TB corpus WILL contain a degenerate mega class — empty docs,
  * boilerplate templates — with millions of members, and for it the
  * roster is an unbounded array in ONE row and the intra-class
  * expansion is a quadratic Σ|class|² output.
  *
  * Above a configurable member cap ([[ConfKey]], default
  * [[DefaultCap]]) a class therefore switches to REPRESENTATIVE
  * routing: its roster collapses to `[min(doc_id)]` (so cross-class
  * expansion emits only representative-level pairs) and its intra
  * pairs are emitted as a STAR — (rep, member) for every other member,
  * linear in class size — instead of all-pairs. Connectivity is fully
  * preserved for every downstream consumer (components, dedup-apply
  * survivorship): rep links the members, and rep carries the class's
  * cross-class edges. Below the cap nothing changes — outputs are
  * byte-identical, which is what keeps the DuckDB oracles green (no
  * fixture class approaches the cap; DedupGuardSpec pins the switch
  * with a synthetic mega class).
  *
  * Skew note: both aggregates here (`count`, `min`, `first`,
  * size-FILTERED `collect_list`) partially aggregate map-side, so a
  * mega class never concentrates its raw members in one task — the
  * reason this uses groupBy + join-back rather than a single window
  * pass (ADVICE r6 on `Components`: window partitioning buffers the
  * whole partition in one task).
  */
object ClassGuard {
  val ConfKey = "spark.graft.maxClassSize"
  val DefaultCap = 4096

  def cap(spark: SparkSession): Int =
    spark.conf.getOption(ConfKey).flatMap(_.toIntOption).getOrElse(DefaultCap)

  /** Collapse a member-level frame (one row per doc: `keyCol`,
    * `idCol`, payload columns constant within a class) into
    *
    *  - `classes`: one row per class — `keyCol`, `ids` (full roster
    *    when |class| <= capSize, `[min(id)]` above it), each payload
    *    column via `first`, and `cls` = the TRUE class size (so df /
    *    weighting semantics never change), and
    *  - `stars`: the mega classes' intra edges — `keyCol`, `rep`
    *    (= min(id), strictly smallest), `member` — one row per
    *    non-representative member, linear in class size.
    */
  def collapse(members: DataFrame, keyCol: String, idCol: String,
      payload: Seq[String], capSize: Int): (DataFrame, DataFrame) = {
    val sizes = members.groupBy(keyCol).agg(
      count(lit(1)).as("cls"), min(col(idCol)).as("rep"))
    val joined = members.join(sizes, Seq(keyCol))
    val firsts = payload.map(c => first(col(c)).as(c)) ++
      Seq(first(col("cls")).as("cls"))
    val small = joined.filter(col("cls") <= capSize)
      .groupBy(keyCol)
      .agg(collect_list(col(idCol)).as("ids"), firsts: _*)
    val mega = joined.filter(col("cls") > capSize)
      .groupBy(keyCol)
      .agg(array(first(col("rep"))).as("ids"), firsts: _*)
    val classes = small.unionByName(mega)
    val stars = joined
      .filter(col("cls") > capSize && col(idCol) =!= col("rep"))
      .select(col(keyCol), col("rep"), col(idCol).as("member"))
    (classes, stars)
  }
}
