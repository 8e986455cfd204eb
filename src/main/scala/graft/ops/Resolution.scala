package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution: exact match first, then a blocked fuzzy
  * (edit-distance) match on the residue, union of both.
  *
  * Semantics from the reference's vehicle resolution cascade
  * (etl2_advclean_and_dimcreatin.py:195-250):
  *   1. exact broadcast equi-join on the normalized name (etl2:206-213)
  *   2. LEFT ANTI join → unresolved residue (etl2:216-218)
  *   3. blocked fuzzy join: equi-join on a cheap blocking key
  *      (prefix-2 of the normalized name, etl2:222,226) + post-filter
  *      `levenshtein <= maxDist` (etl2:233-234), best match per
  *      observation via row_number ordered by (distance, dim id) —
  *      the id tiebreak keeps it deterministic (etl2:236-238)
  *   4. unionByName with allowMissingColumns — exact rows have no
  *      LEV_DIST (etl2:243)
  *
  * Scale design: the dim side is broadcast when small (reference
  * behavior); at 100 TB-scale dims, drop the broadcast hint and the
  * blocking key becomes the shuffle key — candidate pairs stay bounded
  * to (block cardinality × per-block size), never O(N×M). The cascade
  * shrinks the expensive fuzzy probe side to only unresolved rows.
  */
object Resolution {
  /** @param obs  observations: (obsId, obsName) — obsName already normalized
    * @param dim  entities: (dimId, dimName) — dimName already normalized, distinct
    * @return one row per resolved obsId: (obsId, dimId, lev_dist, is_fuzzy);
    *         unresolved observations are absent (caller left-joins).
    */
  def resolve(
      obs: DataFrame, obsId: String, obsName: String,
      dim: DataFrame, dimId: String, dimName: String,
      blockLen: Int = 2, maxDist: Int = 3): DataFrame = {
    // One id per name (min id wins) so the exact join can't fan out and
    // both engines agree on the survivor — the reference guarantees this
    // structurally because dim ids are content-hashes of the name
    // (etl2:158), so this is a no-op there.
    val d = Dedup.latestPerKey(
      dim.select(col(dimId), col(dimName)).distinct(),
      Seq(dimName), Seq(col(dimId).asc))

    // 1. exact
    val exact = obs
      .join(broadcast(d), obs(obsName) === d(dimName), "left")
      .filter(col(dimId).isNotNull)
      .select(col(obsId), col(dimId),
        lit(null).cast("int").as("lev_dist"),
        lit(false).as("is_fuzzy"))

    // 2. residue
    val unresolved = obs.join(exact.select(obsId), Seq(obsId), "left_anti")

    // 3. blocked fuzzy, best-candidate window with deterministic tiebreak
    val ob = unresolved
      .withColumn("__block", substring(col(obsName), 1, blockLen))
      .filter(length(col("__block")) >= blockLen)
    val db = d
      .withColumn("__dblock", substring(col(dimName), 1, blockLen))
      .filter(length(col("__dblock")) >= blockLen)
    val w = Window.partitionBy(col(obsId))
      .orderBy(col("lev_dist").asc, col(dimId).asc)
    val fuzzy = ob
      .join(broadcast(db), col("__block") === col("__dblock"), "inner")
      .withColumn("lev_dist", levenshtein(col(obsName), col(dimName)))
      .filter(col("lev_dist") <= maxDist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(obsId), col(dimId), col("lev_dist"), lit(true).as("is_fuzzy"))

    // 4. union
    exact.unionByName(fuzzy, allowMissingColumns = true)
  }
}
