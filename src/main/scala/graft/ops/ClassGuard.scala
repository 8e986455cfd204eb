package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Mega-class escape hatch for the class-collapse dedup family.
  *
  * The round-6 class-collapse rewrites (jaccard / containment /
  * simjoin / simhash) run their pair pipelines at distinct-class
  * cardinality and expand class pairs back to doc pairs through
  * per-class rosters. That is the right shape for organic duplication
  * (largest class at sf10: 778 docs), but a 100 TB corpus WILL contain
  * a degenerate mega class — empty docs, boilerplate templates — with
  * millions of members, for which an unbounded roster is a single-row
  * array bomb and the intra-class expansion a quadratic output.
  *
  * Above a configurable member cap ([[ClassGuard.ConfKey]], default
  * [[ClassGuard.DefaultCap]]) a class therefore switches to
  * REPRESENTATIVE routing: its roster collapses to `[min(doc_id)]`
  * (so cross-class expansion emits only representative-level pairs)
  * and its intra pairs are emitted as a STAR — (rep, member) for every
  * other member, linear in class size. Connectivity is fully preserved
  * for every downstream consumer (components, dedup-apply
  * survivorship): rep links the members, and rep carries the class's
  * cross-class edges. Below the cap nothing changes — outputs are
  * byte-identical, which is what keeps the DuckDB oracles green (no
  * fixture class approaches the cap; DedupGuardSpec pins the switch
  * with a forced-cap fixture).
  *
  * Plan shape (round 8 — third iteration; an interleaved A/B probe
  * graded each predecessor against the unguarded round-6 plan):
  *
  *  1. ONE heavy shuffle, exactly like round 6: `groupBy(key).agg(
  *     graft_capped_roster, first(payload)…)` with the native
  *     [[graft.functions.CappedRoster]] aggregate bounding every
  *     buffer at O(cap). Persisted — every caller
  *     consumes the class frame several times (index explode, cross
  *     expansion ×2, intra), the same frame they persisted in r6.
  *  2. An EAGER mega-key collect **on that cached aggregate**:
  *     `filter(cls > cap).collect()`. The action materializes the
  *     cache the query needs anyway, so it adds no extra pass over
  *     the data (a separate ids-only pre-probe measured ~25% overhead
  *     per guarded query; the r7 sizes/join-back re-shuffled payload
  *     arrays and regressed the family 2.0-2.8× — VERDICT r7 §1).
  *     The result is bounded by construction — each mega class has
  *     > cap members, so at most N/cap keys exist (10^10 docs /
  *     cap 4096 → ≤ 2.4M keys).
  *  3. No mega keys (the overwhelmingly common case): stars is an
  *     EMPTY LocalRelation. Its emptiness is static, so Catalyst's
  *     PropagateEmptyRelation deletes the callers' entire star-union
  *     branch at optimization time — the guarded plan IS the r6 plan.
  *  4. Mega keys present: they broadcast from the driver list; stars
  *     = members ⨝ broadcast(keys) (a broadcast hash join — mega
  *     members stay spread across their input partitions, no
  *     skewed-key sort-merge funnel) filtered to non-representatives,
  *     linear and unshuffled.
  */
object ClassGuard {
  val ConfKey = "spark.graft.maxClassSize"
  val DefaultCap = 4096

  /** Bound on the driver-side mega-key list. Hitting it means > 16G
    * docs sit in > 4M distinct classes of > cap members each — raise
    * [[ConfKey]] rather than collect an unbounded list. 4M Rows is
    * ~0.25-0.5 GB of driver heap at the bound (VERDICT r8 watch item:
    * the previous 8M bound could pinch a small driver); a corpus that
    * legitimately trips this wants a bigger cap, not a bigger list. */
  private val MaxMegaKeys = 4000000

  def cap(spark: SparkSession): Int =
    spark.conf.getOption(ConfKey).flatMap(_.toIntOption).getOrElse(DefaultCap)

  /** Collapse a member-level frame (one row per doc: `keyCol`,
    * `idCol` — a LONG id, NEVER NULL; `payload` columns constant
    * within a class) into
    *
    *  - `classes`: one row per class — `keyCol`, `ids` (full roster
    *    when |class| <= capSize, `[min(id)]` above it), each payload
    *    column via `first`, and `cls` = the TRUE class size (so df /
    *    weighting semantics never change), and
    *  - `stars`: the mega classes' intra edges — `keyCol`, `rep`
    *    (= min(id), strictly smallest), `member` — one row per
    *    non-representative member, linear in class size. Statically
    *    empty (a zero-row LocalRelation) when no class exceeds the
    *    cap, so downstream star branches optimize away.
    *
    * Materializes the class aggregate eagerly (it is the frame every
    * caller persists and reuses; `classes` comes back persisted, so
    * call sites must NOT persist it again).
    *
    * CONTRACT — null ids: [[graft.functions.CappedRoster]] skips NULL
    * `idCol` values entirely (collect_list parity), so a null member
    * row is invisible to `cls`, `rep`, AND the roster — class size
    * semantics shift vs `count(lit(1))` if ids can be null. Every
    * caller keys on `doc_id`, which the fixtures and the documents
    * schema guarantee non-null; a new caller with nullable ids must
    * filter them first (as q_dedup_simhash filters NULL signatures).
    *
    * CONTRACT — cache lifetime: the internal aggregate stays persisted
    * for the life of the returned (lazy) plans — callers hand
    * `classes`/`stars` on as unexecuted DataFrames, so there is no
    * point at which they could unpersist it themselves. Release is
    * session-level, like every other query-layer persist (base / ex /
    * idx in the dedup family): Bench/Verify clearState() between
    * queries (`spark.catalog.clearCache()` + unpersist of all
    * persistent RDDs). A long-lived interactive session composing
    * guarded queries repeatedly should do the same.
    */
  def collapse(members: DataFrame, keyCol: String, idCol: String,
      payload: Seq[String], capSize: Int): (DataFrame, DataFrame) = {
    require(capSize > 0, s"class cap must be positive, got $capSize")
    val spark = members.sparkSession
    val firsts = payload.map(c => first(col(c)).as(c))
    // The capped/representative roster projection runs BEFORE the
    // persist, so it is evaluated once at materialization time instead
    // of on every downstream read (each guarded query reads the class
    // frame 3-4 times: index explode, cross expansion x2, intra; the
    // per-read `when` re-evaluation graded ~+10% on the payload-free
    // simhash shape in the round-9 P17 probe). `_rep` rides along
    // cached only for the mega-key collect below and is dropped from
    // the returned frame.
    val agged = members.groupBy(keyCol)
      .agg(call_function("graft_capped_roster",
        col(idCol), lit(capSize)).as("_cr"), firsts: _*)
      .select((col(keyCol) +:
        when(col("_cr.cls") <= capSize, col("_cr.ids"))
          .otherwise(array(col("_cr.rep"))).as("ids") +:
        payload.map(col)) :+ col("_cr.cls").as("cls") :+
        col("_cr.rep").as("_rep"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mega = agged.filter(col("cls") > capSize)
      .select(col(keyCol), col("_rep").as("rep"))
      .limit(MaxMegaKeys + 1)
      .collect()
    require(mega.length <= MaxMegaKeys,
      s"more than $MaxMegaKeys classes exceed $ConfKey=$capSize; raise the cap")
    val classes = agged.drop("_rep")
    val stars =
      if (mega.isEmpty) {
        val starSchema = StructType(Seq(
          StructField(keyCol, members.schema(keyCol).dataType),
          StructField("rep", LongType), StructField("member", LongType)))
        spark.createDataFrame(List.empty[org.apache.spark.sql.Row].asJava, starSchema)
      } else {
        val megaDf = spark.createDataFrame(mega.toList.asJava, StructType(Seq(
          StructField(keyCol, members.schema(keyCol).dataType),
          StructField("rep", LongType))))
        members.join(broadcast(megaDf), Seq(keyCol))
          .filter(col(idCol) =!= col("rep"))
          .select(col(keyCol), col("rep"), col(idCol).as("member"))
      }
    (classes, stars)
  }
}
