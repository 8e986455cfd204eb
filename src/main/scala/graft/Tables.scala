package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access + session conf the whole engine assumes.
  *
  * The reference runs Spark 3 with non-ANSI semantics and
  * `spark.sql.legacy.timeParserPolicy=LEGACY` (reference
  * etl1_clean_and_stage.py:23, etl2_advclean_and_dimcreatin.py:46).
  * We pin non-ANSI + UTC at every entry point so query semantics match
  * the classic DataFrame behavior (to_date → null on bad input, casts
  * never throw) and so the DuckDB oracle agrees on day truncation.
  */
object Tables {
  /** Staging root for every fixture write, roundtrip sink, and stream
    * checkpoint the registry performs (CSV/JSONL/ORC/partitioned
    * roundtrips, DPP/range-layout/schema-evolution tables, the six
    * streaming parity roots). The LOCAL-MODE assumption lives HERE and
    * only here: this harness runs single-JVM local[*], so a
    * driver-local tmpdir is readable by every "executor" thread. A
    * real multi-executor deployment sets GRAFT_STAGING_DIR to a
    * shared-filesystem URI (HDFS/object store) and none of the
    * queries change — the paths are deployment details, not query
    * semantics. */
  val stagingDir: String = sys.env.getOrElse("GRAFT_STAGING_DIR", "/tmp")

  /** Per-process staging namespace (round-11 VERDICT item 6): every
    * fixed staging path (roundtrip sinks, csv/jsonl fixtures,
    * DPP/layout tables, the stream-scratch fallback) lives under a
    * run-scoped subdir, so two concurrent sessions — e.g. an sf0.1 dev
    * verify while an sf1 DuckDB compare is still queued — can never
    * overwrite each other's staged files mid-oracle (round 11 saw two
    * sf1 false reds from exactly that race). The oracle SQL strings
    * embed the nonce'd path and are dumped by the SAME process that
    * wrote the files, so a later compare reads this run's bytes no
    * matter what other runs started since. GRAFT_STAGING_NS pins the
    * namespace externally (e.g. to share staged fixtures across a
    * driver's own sequential steps, or on a cluster where the pid of
    * one JVM means nothing). */
  val stagingNs: String =
    sys.env.getOrElse("GRAFT_STAGING_NS", {
      // pid + process START SECOND: pid alone is reusable, so a new run
      // named run_<reused-pid> would silently inherit a dead run's stale
      // staged tree (round-12 ADVICE). The start instant disambiguates —
      // a reused pid gets a fresh namespace, and the sweep can tell a
      // live owner from a namesake (it re-reads the instant).
      val h = ProcessHandle.current()
      val start = h.info().startInstant()
        .map[String](si => s"_${si.getEpochSecond}").orElse("")
      s"run_${h.pid()}$start"
    })

  /** A staging path under [[stagingDir]], namespaced by [[stagingNs]]. */
  def staging(sub: String): String = {
    sweepOnce
    touchNs()
    s"$stagingDir/graft_staging/$stagingNs/$sub"
  }
  @volatile private var lastNsTouch = 0L
  private val heartbeatName = ".graft_heartbeat"

  /** Refresh this run's namespace liveness evidence (rate-limited to
    * once per 10 min): bumps each existing ns root's mtime AND a
    * heartbeat file inside it, so the dead-run sweep's age test
    * measures time since LAST USE, not since first write. Called from
    * [[ensureConf]] and [[load]] — hooks that actually fire on every
    * query build for a session's whole life. The former in-[[staging]]
    * touch was dead code (round-12 ADVICE): every staging() call site
    * is a top-level val evaluated once at object init, before any
    * namespace dir exists, so a >3 h run's files could be reaped by a
    * concurrent JVM's sweep while its DuckDB compare was still queued. */
  private def touchNs(): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastNsTouch > 10L * 60 * 1000) {
      lastNsTouch = now
      nsRoots.foreach { r =>
        val d = new java.io.File(s"$r/$stagingNs")
        if (d.isDirectory) try {
          d.setLastModified(now)
          java.nio.file.Files.writeString(
            d.toPath.resolve(heartbeatName), now.toString)
          ()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** The user-scoped tmpfs stream-scratch root, when /dev/shm exists
    * and is writable (per-run namespaces live under it). */
  private def shmStreamRoot: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      Some(s"/dev/shm/graft_stream_${sys.props.getOrElse("user.name", "anon")}")
    else None
  }

  /** Roots that hold per-run namespaces and get the dead-run sweep:
    * the staging tree and (when tmpfs is in play) the user-scoped
    * stream-scratch tree — the latter lives in RAM, so leaked
    * namespaces there are strictly worse than leaked /tmp files. */
  private def nsRoots: Seq[String] =
    Seq(s"$stagingDir/graft_staging") ++ shmStreamRoot

  /** Best-effort GC of dead runs' namespace trees, once per JVM: a
    * dir is deleted only when its OWNER IS PROVABLY DEAD and its tree
    * is ≥ 3 h past last use — last use = max(dir mtime, heartbeat-file
    * mtime), which [[touchNs]] keeps fresh while any owner is alive
    * (both conditions: a just-exited Verify's files must stay readable
    * for its still-queued DuckDB compare). Ownership evidence, by name
    * shape (round-12 ADVICE — liveness is no longer inferred from the
    * pid digits alone):
    *  - `run_<pid>_<startsec>` (auto format): dead iff the pid is gone
    *    OR its start second differs — a REUSED pid is a namesake, not
    *    an owner;
    *  - bare `run_<pid>` (legacy auto / pinned lookalike): dead iff the
    *    pid is gone; the heartbeat freshness test still protects a
    *    LIVE pinned owner whose name happens to parse this way;
    *  - anything else: pinned, not ours to reap.
    * Failures are swallowed: GC is a courtesy, not a correctness
    * dependency. */
  private lazy val sweepOnce: Unit = try {
    val cutoff = System.currentTimeMillis() - 3L * 3600 * 1000
    nsRoots.map(new java.io.File(_)).foreach { root =>
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(d => d.getName.startsWith("run_") && d.getName != stagingNs)
        .foreach { d =>
          val dead = d.getName.stripPrefix("run_").split('_') match {
            case Array(p) =>
              p.toLongOption.exists(pid => ProcessHandle.of(pid).isEmpty)
            case Array(p, s) =>
              (p.toLongOption, s.toLongOption) match {
                case (Some(pid), Some(start)) =>
                  val h = ProcessHandle.of(pid)
                  !h.isPresent || h.get().info().startInstant()
                    .map[java.lang.Boolean](_.getEpochSecond != start)
                    .orElse(java.lang.Boolean.FALSE)
                case _ => false
              }
            case _ => false
          }
          val hb = new java.io.File(d, heartbeatName)
          val lastUse = math.max(d.lastModified(),
            if (hb.isFile) hb.lastModified() else 0L)
          if (dead && lastUse < cutoff) {
            import scala.reflect.io.Directory
            new Directory(d).deleteRecursively()
            ()
          }
        }
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Scratch root for PER-INVOCATION streaming state: micro-batch input
    * fixtures, checkpoint/offset/commit logs, state-store deltas, and
    * the accumulated output each parity query reads back in the same
    * call. Every parity deletes this tree at the top of its builder, so
    * durability across a host crash buys nothing — the data's life is
    * one invocation. That makes a RAM-backed filesystem the right
    * default when one exists: the micro-batch tax is dominated by
    * per-trigger fsyncs of tiny checkpoint files (offset log + commit
    * log + state delta per batch), which tmpfs turns into memory
    * writes. A cluster deployment sets GRAFT_STREAM_SCRATCH to shared
    * storage (mandatory there anyway — executors must see the
    * checkpoint), restoring the durable path without code change. */
  val streamScratchDir: String = sys.env.get("GRAFT_STREAM_SCRATCH")
    .orElse {
      // User-scoped AND run-namespaced: /dev/shm is world-writable+
      // sticky, so the user segment separates users, and the stagingNs
      // segment separates two concurrent runs by the SAME user — each
      // parity builder recursively deletes its scratch root at the top
      // of its build, so a shared path would let run B reap run A's
      // live checkpoints mid-query (the round-11 staging race class,
      // round-12 review). Dead runs' namespaces are reaped by the same
      // sweep as the staging tree (they live in RAM).
      shmStreamRoot.map(r => s"$r/$stagingNs")
    }
    // No tmpfs: stay under a graft-owned subtree of the staging root —
    // the parity builders recursively delete their scratch roots, so a
    // bare stagingDir fallback would hand them generic paths like
    // /tmp/parity that can clobber unrelated data on a shared host.
    .getOrElse(staging("graft_stream"))

  /** A scratch path under [[streamScratchDir]]. */
  def streamScratch(sub: String): String = s"$streamScratchDir/$sub"

  /** [[ensureConf]] plus streaming-scratch conf; call at the top of the
    * six stream parity builders ONLY. Their checkpoints are
    * per-invocation scratch (deleted at the top of each builder, never
    * resumed), so retaining the default 100 batches of offset/commit/
    * state files only multiplies tiny-file fsyncs per trigger.
    * Session-scoped like any SQLConf, but flipped only on the builders
    * that own every checkpoint they touch — a co-hosted durable
    * streaming query in the same session keeps its recovery window
    * unless it runs concurrently with a parity build. */
  def ensureStreamConf(spark: SparkSession): Unit = {
    ensureConf(spark)
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
    // Spark 4.1 generates + verifies a checksum SIBLING for every
    // checkpoint file (offset/commit log entries, every state-store
    // delta), each written on its own spawned thread —
    // ChecksumCheckpointFileManager showed up directly in the round-13
    // P42 off-CPU stack samples, and the parity scratch dirs carried
    // 3 bookkeeping files per delta (Spark's `N.delta.crc` plus
    // Hadoop ChecksumFileSystem's hidden `.crc` of both). Corruption
    // detection buys nothing for per-invocation tmpfs checkpoints that
    // are deleted at the top of every builder and never resumed; a
    // durable production checkpoint on real storage keeps the default
    // (this conf is scoped to the parity builders, same as
    // minBatchesToRetain). Probe override: -Dgraft.stream.ckChecksum.
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      sys.props.getOrElse("graft.stream.ckChecksum", "false"))
    // Round-14 measured NEGATIVE, recorded so it is not retried: a
    // pure-java.nio CheckpointFileManager (no Hadoop local-FS chmod/ls
    // process forks, no checksum machinery) A/B'd flat-to-slower over
    // all six parities (P48 interleaved ABBA ×12 runs/side at sf0.1:
    // batch 1.81 vs 1.77, scd2 2.36 vs 2.36, wmdedup 1.40 vs 1.41,
    // ssjoin 1.98 vs 1.87, session 2.30 vs 2.13, window 2.07 vs 1.86 —
    // nio first). The Shell forks P47 sampled come from the parquet
    // fixture/output writes' committer path, not the checkpoint
    // manager; the checkpoint files were already cheap on tmpfs.
  }

  /** Idempotent; call at the top of every query builder so semantics do
    * not depend on who created the session. */
  def ensureConf(spark: SparkSession): Unit = {
    touchNs()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // With ANSI off, Spark keeps the legacy sentinel size(NULL) = -1,
    // which no SQL oracle mirrors (DuckDB len(NULL) = NULL) — it
    // hash-failed q_jsonl_scan for three driver runs on the
    // missing-`tags` fixture row. Every other size() call site in this
    // repo operates on split/transform outputs that cannot be NULL
    // (audited round 6; pinned by NullSentinelSpec), so flipping the
    // legacy conf changes exactly the NULL case and kills the whole
    // sentinel class rather than one call site.
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    // Round 6: per-doc side tables (e.g. the nn set-size tables in the
    // dedup family) lost their forced broadcast() hints — a pinned
    // doc-cardinality broadcast is an OOM at 1B+ docs. The default
    // 10 MB STATIC threshold then demoted those joins to shuffles of
    // the far larger pair side at sf10 (nn ≈ 8 MB est.; jaccard
    // 46→83 s). Raising the STATIC threshold instead is a trap: it
    // works on parquet-compressed size estimates, so a 57 MB documents
    // scan made the planner broadcast 50M-row exploded shingle frames
    // (measured heap OOM at sf10). The ADAPTIVE threshold is the right
    // dial — AQE re-plans SMJ→broadcast from ACTUAL post-shuffle
    // sizes: the genuinely-small sides (nn ≈ 16 MB real) convert, the
    // multi-GB index sides never do, and nothing is pinned at cluster
    // scale.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
      (64 * 1024 * 1024).toString)
    // Parquet written without isAdjustedToUTC (e.g. by DuckDB or Hive)
    // would otherwise surface TIMESTAMP_NTZ, which epoch arithmetic
    // (CAST(ts AS BIGINT)) rejects at analysis time — found by the sf1
    // spot-check, whose DuckDB-built fixture broke q_events_sessionize.
    // With the session pinned to UTC the two flavors are numerically
    // identical, so read both as TIMESTAMP.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    graft.functions.VectorExpressions.register(spark)
    graft.functions.TextExpressions.register(spark)
    graft.functions.BloomFunctions.register(spark)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    touchNs()
    if (name == "events") loadEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read nanos as raw longs (legacy conf) and
    * integer-divide to microseconds — the fixture generator emits
    * µs-granular values, so the narrowing is lossless. `div` (integral
    * divide) is load-bearing: a double-typed `/` on ~1.7e18 ns loses
    * precision past 2^53. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}

/** One verifiable operator: a Spark builder + (optionally) equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables. */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)
