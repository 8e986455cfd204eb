package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{call_function, col, lit, xxhash64}

/** Bloom-prefiltered incremental dedup (`q_bloom_prefilter`): sizing
  * formula plus the sketch-build/probe/verify composition. Split out
  * of the query registry so OpsSpec can pin the formula as a pure
  * function and drive the empty-history short-circuit directly. */
object BloomOps {
  /** Target false-positive probability for the prefilter. At 1% the
    * exact verify join sees ~1% of non-dup new docs as extra probes —
    * negligible shuffle overhead for KB..MB of sketch. */
  val TargetFpp = 0.01

  /** Spark caps BloomFilterAggregate at
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits = 67108864
    * (8 MB) by default; past that the aggregate throws. At the cap the
    * filter holds ~7M items at 1% FPP — histories beyond that should
    * shard the sketch per fingerprint-prefix rather than grow one
    * filter, so the cap is a sane ceiling, not a silent degradation. */
  val MaxNumBits = 67108864L

  /** Standard optimal bit count m = ceil(-n·ln(p) / ln(2)²) for n items
    * at FPP p (the same formula behind Spark's
    * BloomFilter.optimalNumOfBits), clamped to [64, MaxNumBits] and
    * rounded up to a multiple of 8 so the serialized sketch is
    * byte-aligned. */
  def sizedBits(numItems: Long, fpp: Double = TargetFpp): Long = {
    require(numItems >= 0, s"numItems must be >= 0, got $numItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(numItems, 1L)
    val raw = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val aligned = ((math.max(raw, 64L) + 7L) / 8L) * 8L
    math.min(aligned, MaxNumBits)
  }

  /** Prefiltered exact dedup of `newDocs` against `hist` on `joinKey`.
    * `hist` should already be persisted by the caller: the count()
    * that sizes the sketch materializes it once, and the sketch
    * aggregate plus the verify join reuse the cached blocks. An empty
    * history skips the sketch entirely (BloomFilterAggregate returns a
    * null sketch for zero rows, which BloomFilterMightContain rejects
    * at analysis time) — the verify join then returns empty on its
    * own. False negatives are impossible, so the join output is
    * bloom-independent regardless of FPP. */
  def prefilteredJoin(hist: DataFrame, newDocs: DataFrame,
      joinKey: String): DataFrame = {
    val nHist = hist.count()
    val survivors =
      if (nHist == 0L) newDocs
      else {
        val bloom = hist
          .agg(call_function("graft_bloom_agg", xxhash64(col(joinKey)),
            lit(nHist), lit(sizedBits(nHist))))
          .head().getAs[Array[Byte]](0)
        newDocs.filter(call_function("graft_bloom_contains",
          lit(bloom), xxhash64(col(joinKey))))
      }
    survivors.join(hist, Seq(joinKey))
  }
}
