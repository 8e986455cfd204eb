package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 prep probe: q_dedup_substring's hot path is
  * `explode(sequence(1, len-31))` → substring → md5-prefix filter — it
  * materializes EVERY position (L-31 rows per doc) through Generate
  * before the 1/16 sample keeps any of them. Variant B computes the
  * SAME md5-prefix-'0' sample row-locally in one kernel that returns
  * only the sampled substrings as an array (identical sample set, so
  * the DuckDB oracle would not change), then explodes the 1/16-sized
  * array. The per-position md5 work is identical on both sides; what B
  * removes is the 16x Generate row traffic and per-row expression
  * machinery.
  *
  * The kernel here is a CodegenFallback TEST-SCOPE prototype (probe
  * only — a promoted src/main version would follow the
  * TextExpressions doGenCode pattern and can only be faster than what
  * this measures). Caveat noted for promotion: the kernel uses Java
  * String.substring (UTF-16 units) where Spark's substring counts code
  * points — identical on the BMP text of every fixture, divergent on
  * surrogate pairs; the promoted kernel must count code points.
  *
  * A and B alternate pass by pass in one JVM so host drift cancels.
  *
  * OUTCOME (round 9, sf0.1, quiet host): B won 5.269 s → 1.335 s
  * (3.95×) with identical rows+hash, and the kernel was promoted to
  * src/main as `graft_sampled_substrings`
  * (`TextExpressions.sampledSubstrings32`, code-point-correct,
  * codegen'd) — q_dedup_substring now IS variant B, so re-running this
  * probe measures B against itself via the registered query. Kept for
  * the record and as the template for explode-then-filter → row-local-
  * kernel promotions.
  */
object P21 {

  /** dev_sampled_substrings(t) → array of the K=32-char substrings of
    * t whose md5 hex starts with '0' (top nibble zero) — bit-identical
    * to the registered query's sample set. */
  case class SampledSubstrings(child: Expression)
      extends UnaryExpression with CodegenFallback {
    private val K = 32
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "dev_sampled_substrings"

    // ThreadLocal, not a shared lazy val: local-mode tasks can evaluate
    // the SAME expression instance concurrently, and MessageDigest is
    // not thread-safe — the exact hazard the promoted src/main kernel
    // (TextExpressions.SampledSubstrings) documents. Matched here so
    // the probe template others copy is safe (ADVICE r9).
    @transient private lazy val mdTl =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    override protected def nullSafeEval(input: Any): Any = {
      val t = input.asInstanceOf[UTF8String].toString
      val n = t.length - (K - 1)
      if (n <= 0) return new GenericArrayData(Array.empty[Any])
      val md = mdTl.get()
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < n) {
        val s = t.substring(i, i + K)
        md.reset()
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0xF0) == 0) out += UTF8String.fromString(s)
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensureConf(spark)

    val reg = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier("dev_sampled_substrings")
    if (!reg.functionExists(fid)) {
      reg.registerFunction(fid,
        new ExpressionInfo(P21.getClass.getCanonicalName, "dev_sampled_substrings"),
        (es: Seq[Expression]) => { require(es.length == 1); SampledSubstrings(es.head) })
    }

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // ---- variant A: the registered query ----
    def planA() = graft.SparkEntry.queries("q_dedup_substring")(spark, dir)

    // ---- variant B: kernel-sampled, otherwise the identical pipeline ----
    def planB() = {
      val K = 32
      val banner = "== standard disclaimer: provided as-is without " +
        "warranty of any kind; redistribution permitted =="
      val seeded = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(lit(banner), col("text")))
            .otherwise(col("text")).as("t"))
        .filter(length(col("t")) >= K)
      val sampled = seeded
        .select(col("doc_id"),
          explode(call_function("dev_sampled_substrings", col("t"))).as("sh"))
      val dup = sampled.groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("sh"), lit(1).as("is_dup"))
      val perDoc = sampled.join(dup, Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          count(col("is_dup")).as("n_dup_sampled"))
      seeded.select(col("doc_id"),
          (length(col("t")) - (K - 1)).cast("long").as("n_pos"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_pos"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("n_dup_sampled"), lit(0L)).as("n_dup_sampled"),
          (coalesce(col("n_dup_sampled"), lit(0L)) > 0).cast("int").as("has_dup"))
    }

    // ---- equivalence first: identical multiset output or the probe is void ----
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(xxhash64(
        col("doc_id"), col("n_pos"), col("n_sampled"),
        col("n_dup_sampled"), col("has_dup")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (ca, cb) = (checksum(planA()), checksum(planB()))
    println(s"[P21] A rows/hash: $ca   B rows/hash: $cb   equal: ${ca == cb}")
    require(ca == cb, "variant B diverged from the registered query — abort")
    clearState()

    // ---- interleaved timing ----
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clearState()
      dt
    }
    // warmup both
    time(planA); time(planB)
    val (as, bs) = (scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double]())
    for (p <- 1 to 5) {
      as += time(planA)
      bs += time(planB)
      println(f"[P21] pass $p: A ${as.last}%.2f s   B ${bs.last}%.2f s")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"[P21] MEDIANS  A(current explode+md5): ${med(as.toSeq)}%.3f s   " +
      f"B(row-local sampled kernel): ${med(bs.toSeq)}%.3f s   " +
      f"ratio ${med(as.toSeq) / med(bs.toSeq)}%.2fx")
    spark.stop()
  }
}
