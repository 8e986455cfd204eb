package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, call_function, col, lit, pmod, when, xxhash64}

/** Bloom-prefiltered incremental dedup (`q_bloom_prefilter`): sizing
  * formula plus the sketch-build/probe/verify composition. Split out
  * of the query registry so OpsSpec can pin the formula as a pure
  * function and drive the empty-history short-circuit directly.
  *
  * Histories whose optimal sketch exceeds the per-aggregate bit cap
  * are sharded by fingerprint prefix (hash-range of the join key):
  * one groupBy builds all shard sketches in a single pass, and the
  * probe routes each row to exactly its shard's sketch, so the 1% FPP
  * contract holds at any history size instead of silently degrading
  * at the cap (~7M items at the 8 MB default).
  */
object BloomOps {
  /** Target false-positive probability for the prefilter. At 1% the
    * exact verify join sees ~1% of non-dup new docs as extra probes —
    * negligible shuffle overhead for KB..MB of sketch. */
  val TargetFpp = 0.01

  /** Default per-sketch bit cap, matching the default of
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits (8 MB).
    * Spark does NOT throw past the cap: BloomFilterAggregate silently
    * clamps the requested numBits with min(numBits, conf cap)
    * (verified against spark-catalyst 4.1.2), so an oversized request
    * degrades FPP silently. We therefore never request more than the
    * cap for one sketch — [[numShards]] splits the history instead. */
  val DefaultMaxNumBits = 67108864L

  /** The live per-sketch cap: the session's
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits if set (tests
    * lower it to drive the sharded path at small n), else the default. */
  def maxNumBits(spark: SparkSession): Long =
    spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(DefaultMaxNumBits)

  /** Standard optimal bit count m = ceil(-n·ln(p) / ln(2)²) for n items
    * at FPP p (the same formula behind Spark's
    * BloomFilter.optimalNumOfBits), floored at 64 and rounded up to a
    * multiple of 8 so the serialized sketch is byte-aligned. UNCLAMPED
    * — callers compare against the cap to decide sharding. */
  def optimalBits(numItems: Long, fpp: Double = TargetFpp): Long = {
    require(numItems >= 0, s"numItems must be >= 0, got $numItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(numItems, 1L)
    val raw = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((math.max(raw, 64L) + 7L) / 8L) * 8L
  }

  /** Single-sketch sizing: optimal bits clamped to the cap. Only valid
    * when the history fits one sketch — the sharded path never clamps
    * (a clamp is exactly the silent FPP degradation sharding exists to
    * avoid). */
  def sizedBits(numItems: Long, fpp: Double = TargetFpp,
      capBits: Long = DefaultMaxNumBits): Long =
    math.min(optimalBits(numItems, fpp), capBits)

  /** Smallest shard count N such that a shard holding ceil(n/N) items
    * sizes under capBits at the target FPP. N = ceil(optimal/cap) is
    * the right answer up to alignment slack; the loop absorbs the
    * slack exactly instead of approximating it.
    *
    * The 4096 bound guards total sketch MEMORY, not probe code size
    * (the O(1)-routing graft_bloom_sharded expression removed that
    * limit): N shards carry up to N·capBits/8 bytes of sketch through
    * the plan — 32 GB at the default cap, far past any sensible
    * driver/broadcast budget. A history that large should be key-range
    * partitioned into independent prefilter jobs (see SCALE.md). */
  def numShards(numItems: Long, fpp: Double = TargetFpp,
      capBits: Long = DefaultMaxNumBits): Int = {
    require(capBits >= 64, s"capBits must be >= 64, got $capBits")
    var n = math.max(1L,
      math.ceil(optimalBits(numItems, fpp).toDouble / capBits).toLong)
    while (optimalBits(ceilDiv(numItems, n), fpp) > capBits) n += 1
    require(n <= 4096, s"numShards $n exceeds the sketch-memory bound " +
      "(n*capBits/8 bytes would ship with the plan); key-range partition " +
      "the history into independent prefilter jobs instead (see SCALE.md)")
    n.toInt
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Fingerprint-prefix shard of a key: a hash-range partition on the
    * same xxhash64 fingerprint the sketch ingests. The sketch re-hashes
    * the long internally (Murmur3 in BloomFilterImpl), so the mod-N
    * structure of a shard's members does not bias its FPP. */
  def shardId(key: Column, nShards: Int): Column =
    pmod(xxhash64(key), lit(nShards.toLong))

  /** All shard sketches in ONE distributed pass: groupBy(shard) →
    * BloomFilterAggregate per group. Driver traffic is N sketches of
    * ≤ cap/8 bytes — sketch-sized, never history-sized. Shards with no
    * history rows are simply absent (the probe treats absent as
    * definitely-not-contained, which is exact). */
  def shardedSketches(hist: DataFrame, joinKey: String, nShards: Int,
      itemsPerShard: Long, bitsPerShard: Long): Array[(Int, Array[Byte])] =
    hist.groupBy(shardId(col(joinKey), nShards).as("__shard"))
      .agg(call_function("graft_bloom_agg", xxhash64(col(joinKey)),
        lit(itemsPerShard), lit(bitsPerShard)).as("__bloom"))
      .select(col("__shard").cast("int"), col("__bloom"))
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))

  /** Might-contain over sharded sketches, O(1) per row at any shard
    * count: the dense array<binary> of sketches travels as ONE foldable
    * literal into `graft_bloom_sharded`, which deserializes once per
    * executor, routes shard = floorMod(hash, N), and evaluates exactly
    * one mightContainLong. Rows whose shard has no sketch (null array
    * element) probe to false — no history hashed there, so they cannot
    * be duplicates. */
  def shardedContains(sketches: Array[(Int, Array[Byte])], key: Column,
      nShards: Int): Column = {
    val dense = new Array[Array[Byte]](nShards)
    sketches.foreach { case (id, bloom) => dense(id) = bloom }
    val sketchLit = array(dense.map(b =>
      if (b == null) lit(null).cast("binary") else lit(b)).toSeq: _*)
    call_function("graft_bloom_sharded", sketchLit, xxhash64(key))
  }

  /** The composed public-machinery equivalent of [[shardedContains]]:
    * route by shard id through a foldable when-chain with one
    * literal-sketch BloomFilterMightContain per branch. Semantically
    * identical (OpsSpec differential-tests them); generated code grows
    * linearly in shard count, so the O(1) expression is the production
    * path and this is the executable spec of what it computes. */
  def shardedContainsChain(sketches: Array[(Int, Array[Byte])], key: Column,
      nShards: Int): Column = {
    val s = shardId(key, nShards)
    val h = xxhash64(key)
    sketches.foldLeft(lit(false): Column) { case (acc, (id, bloom)) =>
      when(s === lit(id.toLong), call_function("graft_bloom_contains",
        lit(bloom), h)).otherwise(acc)
    }
  }

  /** The Bloom prefilter alone: `newDocs` rows that MIGHT be in `hist`
    * by `joinKey` (no false negatives; false positives ≤ ~TargetFpp).
    * Picks single-sketch vs sharded from the history size and the
    * session cap. `hist` should already be persisted by the caller:
    * the count() that sizes the sketch materializes it once, and the
    * sketch aggregate(s) plus the verify join reuse the cached blocks.
    * An empty history short-circuits to empty (BloomFilterAggregate
    * returns a null sketch for zero rows, which
    * BloomFilterMightContain rejects at analysis time). */
  def prefilter(hist: DataFrame, newDocs: DataFrame,
      joinKey: String): DataFrame = {
    val nHist = hist.count()
    if (nHist == 0L) newDocs.limit(0)
    else {
      val cap = maxNumBits(hist.sparkSession)
      val want = optimalBits(nHist)
      if (want <= cap) {
        val bloom = hist
          .agg(call_function("graft_bloom_agg", xxhash64(col(joinKey)),
            lit(nHist), lit(want)))
          .head().getAs[Array[Byte]](0)
        newDocs.filter(call_function("graft_bloom_contains",
          lit(bloom), xxhash64(col(joinKey))))
      } else {
        val n = numShards(nHist, TargetFpp, cap)
        val perShard = ceilDiv(nHist, n)
        val sketches = shardedSketches(hist, joinKey, n, perShard,
          optimalBits(perShard))
        newDocs.filter(shardedContains(sketches, col(joinKey), n))
      }
    }
  }

  /** Prefiltered exact dedup of `newDocs` against `hist` on `joinKey`:
    * the prefilter feeds an exact verify join, so false positives are
    * eliminated and the output is bloom-independent regardless of FPP
    * or shard layout. */
  def prefilteredJoin(hist: DataFrame, newDocs: DataFrame,
      joinKey: String): DataFrame =
    prefilter(hist, newDocs, joinKey).join(hist, Seq(joinKey))
}
