package graft.queries

import graft.{Q, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity-join family beyond the Levenshtein cascade and the
  * approximate (LSH) dedup paths:
  *
  *  - Jaro-Winkler record linkage (`q_fuzzy_jaro`) — the name-matching
  *    scorer, as a native codegen'd expression, oracled against
  *    DuckDB's independent implementation of the same metric.
  *  - Prefix-filtered EXACT set-similarity self-join
  *    (`q_simjoin_prefix`) — the AllPairs/PPJoin candidate rule
  *    (Bayardo et al., WWW'07; Vernica et al., SIGMOD'10): exact
  *    Jaccard ≥ t with no LSH false negatives, candidate generation
  *    bounded by rare-token prefixes instead of bands.
  *
  * Conventions as everywhere: scores in integer basis points, explicit
  * deterministic tiebreaks, identical aliases in Spark and DuckDB.
  */
object SimilarityQueries {
  import Tables.load

  /** Jaro-Winkler blocked fuzzy match (the q_resolution_fuzzy cascade
    * shape with a similarity scorer instead of an edit-distance
    * filter). Observations are deterministic single-char deletions of
    * part names (only slno%3==1 rows corrupted; deletion position ≥ 3
    * so the prefix-2 block always contains the true match); best
    * candidate per observation = max similarity, THEN lexicographic
    * name — fully deterministic in both engines.
    *
    * Scale: the block key is the shuffle key; candidate pairs are
    * (block size)-bounded exactly like the Levenshtein cascade —
    * never obs × dim. The scorer runs inside whole-stage codegen
    * (static kernel call per pair, no interpreted tree).
    *
    * Correctness evidence: DuckDB's `jaro_winkler_similarity` is an
    * unrelated C++ implementation of the same published metric —
    * byte-equal bp scores across every scored pair is two independent
    * implementations agreeing. */
  val qFuzzyJaro = Q(
    "q_fuzzy_jaro",
    (spark, dir) => {
      Tables.ensureConf(spark)
      val p = load(spark, dir, "part")
      val k = col("p_partkey")
      val dim = p.select(lower(trim(col("p_name"))).as("dim_name")).distinct()
      // deletion at 1-indexed pos = 3 + (key % 5): prefix-2 survives
      val pos = (k % 5 + lit(3)).cast("int")
      // substring splice: name[1..pos-1] || name[pos+1..]
      val name = lower(trim(col("p_name")))
      val spliced = concat(
        name.substr(lit(1), pos - 1),
        name.substr(pos + 1, length(name)))
      val obs = p.select(k.as("obs_id"),
        when(k % 3 === 1, spliced).otherwise(name).as("obs_name"))
      val o = obs.withColumn("blk", substring(col("obs_name"), 1, 2))
      val d = dim.withColumn("blk", substring(col("dim_name"), 1, 2))
      val scored = o.join(broadcast(d), Seq("blk"))
        .withColumn("jw_bp",
          round(expr("graft_jaro_winkler(obs_name, dim_name)") * 10000)
            .cast("long"))
        .filter(col("jw_bp") >= 9000)
      val best = Window.partitionBy("obs_id")
        .orderBy(col("jw_bp").desc, col("dim_name").asc)
      scored.withColumn("rn", row_number().over(best))
        .filter(col("rn") === 1)
        .select(col("obs_id"), col("dim_name").as("matched_name"), col("jw_bp"))
    },
    Some("""WITH dim AS (SELECT DISTINCT lower(trim(p_name)) AS dim_name FROM part),
      obs AS (
        SELECT p_partkey AS obs_id,
          CASE WHEN p_partkey % 3 = 1 THEN
            substring(nm, 1, pos - 1) || substring(nm, pos + 1, length(nm))
          ELSE nm END AS obs_name
        FROM (SELECT p_partkey, lower(trim(p_name)) AS nm,
              CAST(p_partkey % 5 + 3 AS INTEGER) AS pos FROM part)),
      scored AS (
        SELECT o.obs_id, d.dim_name,
          CAST(round(jaro_winkler_similarity(o.obs_name, d.dim_name) * 10000) AS BIGINT) AS jw_bp
        FROM obs o JOIN dim d
          ON substring(o.obs_name, 1, 2) = substring(d.dim_name, 1, 2))
      SELECT obs_id, dim_name AS matched_name, jw_bp FROM scored
      WHERE jw_bp >= 9000
      QUALIFY row_number() OVER (PARTITION BY obs_id
        ORDER BY jw_bp DESC, dim_name ASC) = 1"""),
    "Jaro-Winkler blocked fuzzy match (native codegen'd scorer vs DuckDB's independent impl)")

  /** Exact set-similarity self-join with prefix filtering: 3-gram
    * shingle Jaccard ≥ 0.6 over documents, candidates generated ONLY
    * from each document's rarest (n - ceil(0.6 n) + 1) shingles under
    * the global (df asc, shingle asc) order — the AllPairs prefix
    * rule. Safe: if J(A,B) ≥ t the two prefixes must share a token,
    * so unlike MinHash/SimHash there are NO false negatives; the
    * length filter (5·nb ≥ 3·na ∧ 5·na ≥ 3·nb) prunes candidates for
    * free. (Tokens are word 3-grams, the q_dedup_ngram_jaccard
    * vocabulary: unigram word sets on this corpus are so shared that
    * half of all pairs clear 0.6 — shingles keep the join a dedup,
    * not a cross product.)
    *
    * Scale: the inverted index holds only prefix tokens — by
    * construction the RAREST ones, so postings lists are short and
    * the candidate join never touches the stop-word-sized lists that
    * make naive token joins quadratic (the df-cap trick of
    * q_dedup_ngram_jaccard, derived here instead of tuned); at corpus
    * scale the shingle strings would carry as 8-byte stringHash keys
    * (the jaccard query's trick — elided here so the oracle stays a
    * direct string mirror). Verification joins are candidate-bounded:
    * each (doc_a, doc_b) pair expands by |A| tokens, never
    * corpus × corpus. */
  val qSimjoinPrefix = Q(
    "q_simjoin_prefix",
    (spark, dir) => {
      Tables.ensureConf(spark)
      // spread the single-row-group fixture before row-local tokenize;
      // tokens travel as 8-byte stringHash values from the native
      // graft_shingle_hashes kernel (the jaccard-family convention —
      // the first draft shuffled ~25-byte shingle STRINGS and ran 4×
      // slower; hash collisions conflate identically in the md5-based
      // oracle mirror, and the final exact-verified pair set is
      // total-order-invariant anyway). The persist is the same
      // pushdown barrier q_dedup_ngram_jaccard documents.
      val docs = load(spark, dir, "documents").repartition(col("doc_id"))
      val base = docs.select(col("doc_id"),
        TextOps.shingleHashes(TextOps.words(col("text"))).as("hs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // class collapse (the jaccard/containment round-6 pattern): docs
      // with identical token SETS share every quantity AllPairs/PPJoin
      // computes — df contribution (class-weighted), set size, the
      // (df, s) prefix ranking, candidate filters, shared counts, and
      // the final ratio — so the whole join runs at distinct-set-class
      // cardinality; class pairs expand to doc pairs at the end and
      // intra-class pairs are closed-form (jaccard = 1).
      val keyed = base.select(col("doc_id"), col("hs"),
        xxhash64(array_sort(col("hs"))).as("k"))
      // mega-class escape hatch (round 7) — see ClassGuard: rosters
      // above spark.graft.maxClassSize collapse to [min id], intra
      // pairs become a linear star (byte-identical below the cap)
      // classes is a projection of the frame collapse persists
      // internally — a second persist would materialize twice.
      val (classes, megaStars) = graft.ops.ClassGuard.collapse(
        keyed, "k", "doc_id", Seq("hs"), graft.ops.ClassGuard.cap(spark))
      // n = |token set| is just size(hs): ride it through the explode
      // instead of re-counting it downstream (the per-class window
      // COUNT and the nn aggregate + its two joins all derived this
      // same number from posting rows — round-10 P25 deleted them all)
      val tok = classes.select(col("k"), col("cls"), size(col("hs")).as("n"),
          explode(col("hs")).as("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // df is DOCUMENT frequency: weight each class entry by class size
      val dfc = tok.groupBy("s").agg(sum(col("cls")).as("df"))
      val wrk = Window.partitionBy("k").orderBy(col("df").asc, col("s").asc)
      val ranked = tok.join(dfc, Seq("s"))
        .select(col("k"), col("s"), col("df"), col("n"),
          row_number().over(wrk).as("rk"))
      // prefix length = n - ceil(3n/5) + 1 ; ceil(3n/5) = (3n+4) div 5.
      // df >= 2 drops singleton tokens from the candidate index with
      // ZERO completeness cost — a token shared by any pair appears in
      // >= 2 docs by definition, so df = 1 tokens can never generate a
      // candidate. Most of a deduped corpus's shingles are singletons,
      // so this collapses the self-join input by ~an order of magnitude.
      val pref = ranked
        .filter(col("rk") <= col("n") - expr("(n*3 + 4) div 5") + 1)
        .filter(col("df") >= 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val a = pref.select(col("k").as("ka"), col("s"),
        col("n").as("na"), col("rk").as("pa"))
      val b = pref.select(col("k").as("kb"), col("s"),
        col("n").as("nb"), col("rk").as("pb"))
      val cand = a.join(b, Seq("s"))
        .filter(col("ka") < col("kb"))
        .filter(col("nb") * 5 >= col("na") * 3 && col("na") * 5 >= col("nb") * 3)
        // PPJoin positional filter (Xiao et al., WWW'08): a match at
        // positions (pa, pb) caps the best possible overlap at
        // 1 + min(na-pa, nb-pb); Jaccard >= 3/5 needs overlap
        // >= ceil(3(na+nb)/8), so late-prefix collisions — exactly
        // what hot tokens produce — drop before the pair distinct()
        .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= expr("(3*(na + nb) + 7) div 8"))
        .select("ka", "kb").distinct()
      // Exact verification is ROW-LOCAL (round-10 P25, ~30% off the
      // whole query): the one join pair that fetches the roster ids
      // for expansion also carries the token-set arrays, and shared =
      // graft_pair_overlap(hs_a, hs_b) — the multiset join count the
      // tok⋈tok⋈groupBy stage used to shuffle per candidate pair.
      // MULTISET (not array_intersect) semantics are load-bearing:
      // hs dedups shingle STRINGS before hashing, so colliding values
      // must count cnt_a·cnt_b exactly as the oracle's posting join
      // does. Class cardinality: no forced broadcast (AQE decides) —
      // a pinned broadcast of a corpus-sized table is an OOM at 100 TB.
      val cp = cand
        .join(classes.select(col("k").as("ka"), col("hs").as("hs_a"),
          col("ids").as("ids_a")), Seq("ka"))
        .join(classes.select(col("k").as("kb"), col("hs").as("hs_b"),
          col("ids").as("ids_b")), Seq("kb"))
        .select(col("ids_a"), col("ids_b"),
          expr("graft_pair_overlap(hs_a, hs_b)").as("shared"),
          size(col("hs_a")).cast("long").as("na"),
          size(col("hs_b")).cast("long").as("nb"))
        .filter(col("shared") * 5 >= (col("na") + col("nb") - col("shared")) * 3)
        .select(col("ids_a"), col("ids_b"), col("shared"),
          round(lit(10000.0) * col("shared") / (col("na") + col("nb") - col("shared")))
            .cast("long").as("jacc_bp"))
      val cross = cp
        .select(col("shared"), col("jacc_bp"), explode(col("ids_a")).as("da"), col("ids_b"))
        .select(col("shared"), col("jacc_bp"), col("da"), explode(col("ids_b")).as("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("shared"), col("jacc_bp"))
      // intra-class: identical sets → shared = n (full set size),
      // jaccard exactly 1; the original always emitted these (a class
      // of cls ≥ 2 gives every prefix token df ≥ 2)
      val intra = classes.filter(col("cls") > 1)
        .select(size(col("hs")).cast("long").as("n"),
          explode(col("ids")).as("da"), col("ids"))
        .select(col("n"), col("da"), explode(col("ids")).as("db"))
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      // mega-class star through the representative (rep = min id)
      val starIntra = megaStars
        .join(classes.select(col("k"), size(col("hs")).cast("long").as("n")), Seq("k"))
        .select(col("rep").as("doc_a"), col("member").as("doc_b"),
          col("n").as("shared"), lit(10000L).as("jacc_bp"))
      cross.unionByName(intra).unionByName(starIntra)
        .select("doc_a", "doc_b", "shared", "jacc_bp")
    },
    Some("""WITH d AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
          THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w)-2)]
          ELSE [array_to_string(w, ' ')] END) AS ws
        FROM (SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM documents)),
      e0 AS (SELECT doc_id, unnest(ws) AS s0 FROM d),
      tok AS (SELECT doc_id,
        CAST(('0x'||substr(md5(s0),1,15)) AS BIGINT) % 2147483647 AS s FROM e0),
      dfc AS (SELECT s, COUNT(*) AS df FROM tok GROUP BY s),
      rk AS (
        SELECT t.doc_id, t.s, c.df,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY c.df ASC, t.s ASC) AS rk,
          COUNT(*) OVER (PARTITION BY t.doc_id) AS n
        FROM tok t JOIN dfc c USING (s)),
      pref AS (SELECT doc_id, s, n, rk FROM rk
        WHERE rk <= n - ((n*3 + 4) // 5) + 1 AND df >= 2),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
          AND 5*b.n >= 3*a.n AND 5*a.n >= 3*b.n
          AND 1 + least(a.n - a.rk, b.n - b.rk) >= (3*(a.n + b.n) + 7) // 8),
      nn AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
      sh AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
        FROM cand c
        JOIN tok ta ON ta.doc_id = c.doc_a
        JOIN tok tb ON tb.doc_id = c.doc_b AND tb.s = ta.s
        GROUP BY 1, 2)
      SELECT s.doc_a, s.doc_b, s.shared,
        CAST(round(10000.0 * s.shared / (na.n + nb.n - s.shared)) AS BIGINT) AS jacc_bp
      FROM sh s
      JOIN nn na ON s.doc_a = na.doc_id
      JOIN nn nb ON s.doc_b = nb.doc_id
      WHERE 5*s.shared >= 3*(na.n + nb.n - s.shared)"""),
    "Exact Jaccard>=0.6 self-join via AllPairs prefix filtering (no LSH false negatives)")

  val all: Seq[Q] = Seq(qFuzzyJaro, qSimjoinPrefix)
}
