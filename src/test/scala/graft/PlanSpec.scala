package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape regression tests: the properties that make these plans
  * scale (broadcasts, rank-limit pushdown, column pruning at the scan)
  * are asserted so a refactor that silently loses one fails CI, not a
  * cluster run. */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val dppSubdir = "graft_dpp"

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
  }

  test("flagship entry uses broadcast hash joins for all dims") {
    val plan = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("flagship entry executes and returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_join_broadcast_left broadcasts the lookup side") {
    assert(planString("q_join_broadcast_left").contains("BroadcastHashJoin"))
  }

  test("q_topk_global fuses sort+limit into TakeOrderedAndProject") {
    assert(planString("q_topk_global").contains("TakeOrderedAndProject"))
  }

  test("q_ann_cosine_topk pushes rank<=k into WindowGroupLimit") {
    assert(planString("q_ann_cosine_topk").contains("WindowGroupLimit"))
  }

  test("q1 scan prunes lineitem to the referenced columns only") {
    val fs = scans("q1_pricing_summary")
    assert(fs.nonEmpty)
    val readCols = fs.map(_.requiredSchema.fieldNames.toSet).reduce(_ ++ _)
    // the full lineitem table is 11 columns; the query needs 4
    assert(readCols.size <= 5, s"read too many columns: $readCols")
  }

  test("q_join_broadcast_left pushes join-key IsNotNull to the scan") {
    val fs = scans("q_join_broadcast_left")
    assert(fs.nonEmpty)
    assert(fs.exists(_.metadata.get("PushedFilters").exists(_ != "[]")))
  }

  test("partitioned writes enable partition pruning on read-back") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("prune").toString
    try {
      Tables.load(spark, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
      val back = spark.read.parquet(tmp).filter(col("o_year") === 1995)
      val scan = back.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get
      // the year predicate must land in PartitionFilters (pruned
      // directories), not in data filters (full scan + row filter)
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "o_year")))
      assert(back.count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q_partitioned_roundtrip read-back scan prunes by partition") {
    val fs = scans("q_partitioned_roundtrip")
    assert(fs.nonEmpty)
    assert(fs.exists(_.partitionFilters.exists(_.references.exists(_.name == "o_year"))),
      s"o_year predicate not in partitionFilters: ${fs.map(_.partitionFilters)}")
  }

  test("q_join_anti broadcasts the (tiny) filtered side") {
    val plan = planString("q_join_anti")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_fact_assembly keeps both dim joins broadcast (fact never shuffles)") {
    val plan = planString("q_fact_assembly")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_events_sliding projects narrow before the window generate") {
    val plan = SparkEntry.queries("q_events_sliding")(spark, dir)
      .queryExecution.executedPlan
    val expand = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e
      }
      case e: org.apache.spark.sql.execution.ExpandExec => Seq(e)
    }.flatten.headOption
    // the generate doubles every row; it must carry only the narrow
    // projection (window struct + type + cents), not the event record
    assert(expand.nonEmpty, "expected ExpandExec for the sliding window")
    assert(expand.get.output.size <= 4,
      s"expand too wide: ${expand.get.output.map(_.name)}")
  }

  test("q_join_salted stays a shuffle join (salting targets reducers)") {
    val plan = planString("q_join_salted")
    // salting only makes sense for a shuffled join; a broadcast here
    // would mean the replicated side silently crossed the threshold
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
  }

  test("q_counts aggregates with map-side partial aggregation") {
    val plan = planString("q_counts")
    // two HashAggregate nodes (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("q_topk_per_key aggregates the top-k map-side (no window sort)") {
    val plan = planString("q_topk_per_key")
    // typed-udaf top-k: ObjectHashAggregate partial + final around the
    // exchange, and NO Window node — the whole point is that the group's
    // rows never get shuffled and sorted
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2)
    assert(!plan.contains("Window"), "top-k fell back to a window sort")
  }

  test("q_kmeans_lloyd assigns row-locally (centroids are literals, no join)") {
    val plan = planString("q_kmeans_lloyd")
    // assignment folds centroids into the projection: the corpus never
    // joins or shuffles for it; the only exchange is the final stats agg
    assert(!plan.contains("Join"), "k-means assignment became a join")
    assert(!plan.contains("Window"), "k-means assignment became a window")
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("dedup candidate joins are equi-joins, never nested-loop") {
    // the blocked designs (LSH bands / inverted index / simhash bands)
    // must compile to hash-partitioned equi-joins; a refactor that
    // degenerates to BroadcastNestedLoopJoin/CartesianProduct would be
    // all-pairs at cluster scale
    for (q <- Seq("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
        "q_dedup_simhash", "q_dedup_emb_cosine")) {
      val plan = planString(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
      assert(!plan.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("q_multimodal_frames stays shuffle-free (row-local chain)") {
    // decode → resize → frame-sample is embarrassingly parallel; an
    // Exchange here would mean payload bytes or frames shuffle
    val plan = planString("q_multimodal_frames")
    assert(!plan.contains("Exchange"), "multimodal chain acquired a shuffle")
  }

  test("q_star_fact resolves against broadcast dims") {
    // the resolution cascade joins the catalog-sized dim lookups by
    // broadcast; the stage-sized side must never shuffle for them
    val plan = planString("q_star_fact")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "dim lookups lost their broadcast")
  }

  test("q_star_fact residue is the null branch of one left join, not an anti join") {
    // round-10 fold: the resolution exact/residue split reads the persisted
    // `matched` frame twice (IsNotNull / IsNull) instead of re-deriving the
    // keyed window four times through a LeftAnti probe+build. A LeftAnti
    // reappearing here means the fold regressed to the four-derivation plan.
    val plan = planString("q_star_fact")
    assert(!plan.contains("LeftAnti"), "resolution residue regressed to an anti join")
  }

  test("q_sample_stratified is shuffle-free (row-local hash filter)") {
    // deterministic sampling must cost a scan and nothing else — an
    // Exchange would mean the sampler shuffles the whole corpus
    val plan = planString("q_sample_stratified")
    assert(!plan.contains("Exchange"), "sampler acquired a shuffle")
  }

  test("q_vec_quantize is shuffle-free (row-local quantization)") {
    val plan = planString("q_vec_quantize")
    assert(!plan.contains("Exchange"), "quantizer acquired a shuffle")
  }

  test("q_decontaminate broadcasts the benchmark shingle set") {
    // eval suites are tiny; the corpus side must probe a broadcast,
    // never shuffle for the contamination join
    val plan = planString("q_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), "benchmark side lost its broadcast")
  }

  test("q_stats_corr ships six longs per group, aggregated map-side") {
    // the whole point of the integer-sum formulation is partial
    // aggregation: each task emits one row of sums per group
    val plan = planString("q_stats_corr")
    assert(plan.contains("partial_"), "stats sums lost map-side combine")
    assert(!plan.contains("corr("), "fell back to double-accumulating corr()")
  }

  test("q_gapfill joins the dense axis co-partitioned, no cartesian") {
    val plan = planString("q_gapfill")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "gap-fill degenerated to a cross join")
  }

  test("q_join_range decomposes to an equi-join, never a nested loop") {
    // the entire point of day-bucket decomposition: the range predicate
    // must ride on a hash-joinable equi-condition, not drive the join
    val plan = planString("q_join_range")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "range join degenerated to a nested loop:\n" + plan)
    assert(plan.contains("Join"), "expected a join in the plan")
  }

  test("q_bpe_pairs fuses its top-20 into TakeOrderedAndProject") {
    assert(planString("q_bpe_pairs").contains("TakeOrderedAndProject"))
  }

  test("q_approx_sketches avoids exact-Percentile and Expand (r3 6.6s regression)") {
    // the exact side must stay window-rank median + distinct→count:
    // Spark's exact percentile() buffers every value per group, and
    // countDistinct beside other aggs plans an input-doubling Expand
    val plan = planString("q_approx_sketches")
    assert(!plan.contains("percentile("), s"exact Percentile back in plan:\n$plan")
    assert(!plan.contains("Expand"), s"countDistinct Expand back in plan:\n$plan")
  }

  test("q_scd2_orders is a single-exchange plan (custkey partitioning reused)") {
    // both windows, the run aggregate, and the lead window all key on
    // o_custkey (or a superset) — the whole SCD2 history build must
    // stay one shuffle at any customer cardinality
    val plan = planString("q_scd2_orders")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("q_scd2_merge broadcasts the affected-customer key set (anti + semi)") {
    // the update batch's keyset is batch-sized: both the untouched
    // pass-through (anti) and the affected-orders selection (semi)
    // must broadcast it, never shuffle the history
    val plan = planString("q_scd2_merge")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_line_dedup first-occurrence is a min-aggregate, not a line window") {
    // boilerplate lines are the heavy hitters: a row_number window
    // funnels each line's occurrences into one partition, while
    // min(enc) partial-aggregates map-side (the Etl2 min(struct) lesson)
    assert(!planString("q_line_dedup").contains("Window"))
  }

  test("q_mixture_sample broadcasts rates; corpus never sort-merge joins") {
    val plan = planString("q_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_zorder_cluster interleave stays codegen (no lambda, one agg exchange)") {
    val plan = planString("q_zorder_cluster")
    // the unrolled shift-sum must not regress to an interpreted
    // higher-order transform, and the only hash exchange is the
    // 1024-ary bucket aggregate
    assert(!plan.contains("ArrayTransform") && !plan.contains("transform("))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("q_join_bucketed: co-bucketed SMJ, zero exchange on either join input") {
    val plan = planString("q_join_bucketed")
    assert(plan.contains("SortMergeJoin"), plan)
    // bucketed scans announce their bucket pruning state
    assert(plan.contains("SelectedBucketsCount"), plan)
    // the ONLY exchange is the post-join mktsegment aggregate; the
    // join reads bucket i against bucket i with no reshuffle — the
    // entire point of paying the bucketed write
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("q_orc_roundtrip pushes the predicate into the ORC scan") {
    val fs = scans("q_orc_roundtrip")
    assert(fs.nonEmpty)
    val orc = fs.filter(_.relation.fileFormat.toString.toLowerCase.contains("orc"))
    assert(orc.nonEmpty, s"no ORC scan in: ${fs.map(_.relation.fileFormat)}")
    // quantity/discount predicates must reach the ORC reader (row-group
    // skipping), not run as a post-scan filter only
    assert(orc.exists(_.metadata.get("PushedFilters").exists(s =>
      s.contains("LessThanOrEqual") && s.contains("GreaterThanOrEqual"))),
      orc.map(_.metadata.get("PushedFilters")).toString)
  }

  test("q_semantic_dedup assigns row-locally (centroid literals, no assign join)") {
    val plan = planString("q_semantic_dedup")
    // k-means assignment must stay a projection over plan literals —
    // the corpus never joins against a centroid table; the only joins
    // are not present at all (pair kernel is flatMapGroups)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_bm25_rank broadcasts query terms + stats; top-20 fuses into TakeOrdered") {
    val plan = planString("q_bm25_rank")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1, plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // the 1-row stats scalar
  }

  test("q_join_full_outer is an SMJ FullOuter — neither side broadcast") {
    val plan = planString("q_join_full_outer")
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_dedup_substring: winnowing sample is the native kernel, before the shuffle") {
    val plan = planString("q_dedup_substring")
    // the 1/16 selection happens inside graft_sampled_substrings (one
    // row-local kernel under the exchange — round-9 P21: 4x over the
    // explode+md5 form it replaced), and no nested-loop/cartesian
    // join sneaks in
    assert(plan.contains("graft_sampled_substrings"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_pagerank: no cartesian/nested-loop; rank updates are hash aggregates") {
    val plan = planString("q_pagerank")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // per-round inbound sums must partial-aggregate map-side
    assert(plan.contains("HashAggregate"), plan)
    // final top-20 fuses into TakeOrderedAndProject
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_rrf_hybrid: query sides broadcast; rank filters push to WindowGroupLimit") {
    val plan = planString("q_rrf_hybrid")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_lm_perplexity: count joins hash-join on bigram, never cartesian") {
    val plan = planString("q_lm_perplexity")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop allowed is the 1-row vocab-size scalar cross
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("ANN/RRF query sets are fixed-size: the id cap reaches the scan") {
    // the < 25000 cap keeps |Q| ≤ 500 at every corpus scale; without it
    // the %50 set is 2% OF THE CORPUS and brute force goes O(N²/50)
    // (measured at sf10: a 5e9-row spilling rank sort). The filter must
    // be pushed into the parquet scan, not applied post-join.
    Seq("q_ann_cosine_topk", "q_ann_ivf_topk", "q_rrf_hybrid").foreach { n =>
      val pushed = scans(n).flatMap(_.metadata.get("PushedFilters"))
      assert(pushed.exists(_.contains("25000")),
        s"$n query-set cap not pushed to a scan: $pushed")
    }
  }

  test("q_ann_ivfpq_topk: broadcast probes/queries, no cartesian, rank pushed") {
    val plan = planString("q_ann_ivfpq_topk")
    // the corpus-side code scan joins BROADCAST probe cells and the
    // shortlist re-rank joins BROADCAST query vectors — the corpus
    // must never shuffle for either
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // both window cuts (ADC shortlist, final top-10) bound map-side
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_sample_weighted: per-source top-k bounded map-side by WindowGroupLimit") {
    val plan = planString("q_sample_weighted")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_anomaly_zscore: segment stats broadcast back to the row scan") {
    val plan = planString("q_anomaly_zscore")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_incr_agg: base and delta date bounds both push to the scans") {
    // incremental maintenance only pays off if the delta scan reads the
    // delta partition — the cutoff must reach parquet as a pushed filter
    val pushed = scans("q_incr_agg").flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.count(_.contains("o_orderdate")) >= 2, pushed.toString)
  }

  test("q_hll_rollup: sketch rollup aggregates partially (map-side combine)") {
    val plan = planString("q_hll_rollup")
    assert(plan.contains("partial_hll_sketch_agg"), plan)
    // the union level must ALSO combine map-side — that is the whole
    // point of a mergeable sketch rollup
    assert(plan.contains("partial_hll_union_agg"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_dq_audit: RI check is an id-only anti join, row checks one aggregate") {
    val plan = planString("q_dq_audit")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin") || plan.contains("LeftAnti"), plan)
  }

  test("q_collocations: corpus shuffles once into c12; top-20 fuses TakeOrdered") {
    val plan = planString("q_collocations")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // c1/c2/N derive from c12 (InMemoryTableScan), never rescan documents
    val docScans = scans("q_collocations")
      .count(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans <= 1, s"documents scanned $docScans times")
  }

  test("q_attribution: one user_id shuffle serves first/last/count windows") {
    val plan = planString("q_attribution")
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    assert("Window".r.findAllIn(plan).size >= 1, plan)
  }

  test("q_bpe_encode: corpus join on word, no cartesian, merges fold vocab-only") {
    val plan = planString("q_bpe_encode")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_triangle_count: wedge closing is hash/merge joins, never cartesian") {
    val plan = planString("q_triangle_count")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_snapshot_diff: full-outer PK join, no row-hash string formatting") {
    val plan = planString("q_snapshot_diff")
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_schema_evolution merged read groups without a cartesian") {
    val plan = planString("q_schema_evolution")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q_grouping_sets plans all sets in one Expand, one aggregate pass") {
    val plan = planString("q_grouping_sets")
    assert("Expand".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("q_unpivot expands AFTER the aggregate (months-sized), not on the fact") {
    // the Expand's child must be the aggregated wide frame, i.e. the
    // plan reads scan -> aggregate -> expand, never scan -> expand
    val plan = SparkEntry.queries("q_unpivot")(spark, dir)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("Expand"), s)
    val expandIdx = s.indexOf("Expand")
    val aggIdx = s.lastIndexOf("HashAggregate")
    assert(aggIdx > expandIdx, "aggregate should be below (after in text) the Expand\n" + s)
  }

  test("q_quantile_bins: parallel range sort, never a single-partition window") {
    val plan = planString("q_quantile_bins")
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q_url_extract is a shuffle-free row-local projection") {
    val plan = planString("q_url_extract")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("q_text_entropy shuffles only on keys, never a global funnel") {
    val plan = planString("q_text_entropy")
    assert(!plan.contains("SinglePartition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_knn_graph: bucket kernel + windowed top-k, no all-pairs join") {
    val plan = planString("q_knn_graph")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
    // Round-10 fusion pin (VERDICT r9 item 1): mutuality is ONE pair-key
    // hash aggregate, not a self-join — a regression to the join form
    // re-shuffles the top-k frame twice and re-introduces its persist.
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("InMemoryTableScan"), plan)
  }

  test("q_table_profile: every branch scans at most 2 pruned columns") {
    val ss = scans("q_table_profile")
    assert(ss.size == 6, s"expected 6 per-column scans, got ${ss.size}")
    ss.foreach { s =>
      assert(s.requiredSchema.size <= 2,
        s"profile branch reads ${s.requiredSchema.size} cols: ${s.requiredSchema}")
    }
  }

  test("q_bloom_sharded probes through the O(1) sharded expression") {
    val plan = planString("q_bloom_sharded")
    assert(plan.contains("graft_bloom_sharded"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_feature_hash: row-local hashing, one combinable shuffle, no joins") {
    val plan = planString("q_feature_hash")
    assert(!plan.contains("Join"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_join_dpp: fact scan carries a dynamic pruning partition filter") {
    val ss = scans("q_join_dpp")
    val factScans = ss.filter(_.toString.contains(dppSubdir))
    assert(factScans.nonEmpty, s"no scan over the partitioned fact in\n$ss")
    assert(factScans.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      factScans.map(_.toString).mkString("\n"))
  }

  test("q_audio_frames decodes and windows without any shuffle") {
    val plan = planString("q_audio_frames")
    assert(!plan.contains("Exchange"), plan)
  }

  test("q_cdc_apply: id-only anti join + changes-sized upsert, no cartesian") {
    val plan = planString("q_cdc_apply")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_histogram / q_k_anonymity are one combinable shuffle each") {
    for (q <- Seq("q_histogram", "q_k_anonymity")) {
      val plan = planString(q)
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      // partial + final aggregate = map-side combine is in place
      assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    }
  }

  test("q_fuzzy_jaro: native scorer inside an equi block join, never a cross join") {
    val plan = planString("q_fuzzy_jaro")
    assert(plan.contains("graft_jaro_winkler"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_simjoin_prefix: candidate generation is equi-joins only (no all-pairs)") {
    val plan = planString("q_simjoin_prefix")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_random_projection is entirely row-local (no shuffle)") {
    val plan = planString("q_random_projection")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q_covariance_matrix: one combinable aggregate, no join, no Expand") {
    val plan = planString("q_covariance_matrix")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Expand"), plan)
    // partial + final aggregate = the d^2 sums combine map-side
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_split_holdout: row-local hash + combinable aggregate, no join") {
    val plan = planString("q_split_holdout")
    assert(!plan.contains("Join"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_sentence_split: row-local segmentation (no join, no aggregate)") {
    val plan = planString("q_sentence_split")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("Generate"), plan) // the posexplode
  }

  test("q_chi_square: cells-sized joins only; the single 1-row BNLJ is the grand total") {
    val plan = planString("q_chi_square")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
  }

  test("q_label_propagation: keyed joins and windows only, no cartesian") {
    val plan = planString("q_label_propagation")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_sampling_temperature: source-sized frame, one 1-row BNLJ for the total") {
    val plan = planString("q_sampling_temperature")
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_ngram_novelty: inverted-index shape, keyed joins only") {
    val plan = planString("q_ngram_novelty")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_ngram_novelty: every shuffle keys on a hashed LONG, never the shingle string") {
    // Round-9 change (VERDICT r8 item 7): the min-agg + join-back used
    // to exchange raw shingle STRINGS; both shuffles now carry
    // stringHash-ed longs (P20 A/B: shuffle write 5.08 -> 3.26 MiB).
    // Long attributes render with an `L` suffix in the plan string, so
    // a regression to string keys fails this key-type scan.
    // DELIBERATE STRICTNESS (ADVICE r9): the `[^)]+` capture + naive
    // comma split would fragment a composite key expression with nested
    // parens/commas (e.g. coalesce(a#1L, b#2L)) and false-fail — that
    // is intended: this query's exchanges must key on PLAIN long
    // attributes, nothing fancier. If the plan legitimately changes to
    // a composite long key, relax to matching `#\d+L` per key instead.
    val plan = planString("q_ngram_novelty")
    val keyLists = "hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keyLists.nonEmpty, plan)
    keyLists.foreach { args =>
      val keys = args.split(",").map(_.trim).filter(_.contains("#"))
      assert(keys.nonEmpty, s"no key attribute in hashpartitioning($args)")
      keys.foreach { k =>
        assert(k.matches("""\w+#\d+L"""),
          s"shuffle key `$k` is not a plain long attribute — the raw " +
            s"shingle string leaked back into an exchange: $plan")
      }
    }
  }

  test("q_tokenizer_fertility: row-local counts + combinable aggregate, no join") {
    val plan = planString("q_tokenizer_fertility")
    assert(!plan.contains("Join"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_winsorize: caps broadcast back, no cartesian, no sort-merge") {
    val plan = planString("q_winsorize")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q_multimodal_dedup: rep join broadcasts; digest group-by is the only wide op") {
    val plan = planString("q_multimodal_dedup")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_sliding_distinct: explode-after-dedup, no join anywhere") {
    val plan = planString("q_sliding_distinct")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Generate"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_retention_cohorts: keyed join + combinable matrix aggregate") {
    val plan = planString("q_retention_cohorts")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_lag_features: one window pass keyed by customer, no join") {
    val plan = planString("q_lag_features")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("q_assoc_rules: per-order pair join, category-sized broadcasts, one 1-row BNLJ") {
    val plan = planString("q_assoc_rules")
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_auc_eval: corpus collapses to per-score rows before any window") {
    val plan = planString("q_auc_eval")
    assert(!plan.contains("CartesianProduct"), plan)
    // the combinable per-score aggregate sits below the rank window
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Window"), plan)
  }

  test("q_dedup_lsh_eval: id-sized joins only; the two 1-row metric crosses are BNLJ") {
    val plan = planString("q_dedup_lsh_eval")
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2, plan)
  }

  test("q_dedup_lsh_eval: the exact-truth stage runs the pair_overlap kernel, not an explode-join") {
    // Round-9 change (carried from r6): the (pairs x |tokens|)-row
    // explode-join + groupBy was replaced by two pair-id-keyed joins
    // carrying one cached hash array each + the row-local
    // graft_pair_overlap multiset kernel (PropertySpec pins its
    // semantics; this pins that the query actually USES it).
    val plan = planString("q_dedup_lsh_eval")
    assert(plan.contains("graft_pair_overlap"), plan)
  }

  test("q_interval_merge: per-user windows only, no join, no single partition") {
    val plan = planString("q_interval_merge")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("q_simjoin_prefix verifies row-locally: rank window only, pair_overlap present") {
    // Round-10 restructure pin: the class token-set arrays carry n =
    // size(hs) and the exact-overlap verification (graft_pair_overlap),
    // so every window spec in the plan must be the (df, s) prefix RANK
    // (row_number) — the per-class COUNT window and the posting-level
    // shared-count aggregate are gone. (The rank window STRING may
    // print once per cached-plan consumer; counting nodes would pin
    // the printer, not the plan.)
    val plan = planString("q_simjoin_prefix")
    assert(plan.contains("graft_pair_overlap"), plan.take(4000))
    val specs = "(\\w[\\w()0-9#]*) windowspecdefinition".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("row_number")),
      s"non-rank window spec in plan: $specs\n${plan.take(4000)}")
  }

  test("q_dedup_lsh_eval truth stage: rank window only (size(hs) carries the token count)") {
    val plan = planString("q_dedup_lsh_eval")
    assert(plan.contains("graft_pair_overlap"), plan.take(4000))
    val specs = "(\\w[\\w()0-9#]*) windowspecdefinition".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("row_number")),
      s"non-rank window spec in plan: $specs\n${plan.take(4000)}")
  }

  test("q_max_concurrency: the sweep never funnels a window through one partition") {
    val plan = planString("q_max_concurrency")
    // the occupancy prefix-sum must come from the range-partitioned
    // runner: every window in the plan is partitioned by the physical
    // partition id — none is a global ORDER BY (empty partition spec).
    // (The 1-row final aggregates still exchange to a single partition;
    // that is k partial rows, not the point stream.)
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("__gr_pid")), plan)
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
