package graft

import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Unit tests for the text/vector extension primitives. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("normText collapses whitespace and case") {
    val got = Seq("  The  QUICK\t fox ").toDF("t")
      .select(TextOps.normText(col("t"))).as[String].first()
    assert(got == "the quick fox")
  }

  test("shingles3: sliding 3-grams, whole-doc fallback for short docs") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles3(TextOps.words(col("t")))).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("stringHash is stable and in range") {
    val h = Seq("abc", "abc", "xyz").toDF("s")
      .select(TextOps.stringHash(col("s"))).as[Long].collect()
    assert(h(0) == h(1) && h(0) != h(2))
    assert(h.forall(v => v >= 0 && v < TextOps.P))
  }

  test("minhash: identical docs share signatures; similar docs collide more") {
    def sig(t: String): Seq[Long] = Seq(t).toDF("t")
      .select(TextOps.minhashSignature(
        transform(array_distinct(TextOps.shingles3(TextOps.words(col("t")))),
          s => TextOps.stringHash(s)))).as[Seq[Long]].first()
    val a = sig("the quick brown fox jumps over the lazy dog today")
    val b = sig("the quick brown fox jumps over the lazy dog today")
    val c = sig("completely different words in this document entirely now then")
    assert(a == b)
    assert(a.length == 8)
    assert(a != c)
  }

  test("simhash: identical inputs agree; hamming to different input is large") {
    def sim(t: String): Long = Seq(t).toDF("t")
      .select(TextOps.simhash(
        transform(array_distinct(TextOps.words(col("t"))),
          w => TextOps.stringHash(w)), 32)).as[Long].first()
    val a = sim("alpha beta gamma delta epsilon")
    val b = sim("alpha beta gamma delta epsilon")
    val c = sim("zeta eta theta iota kappa")
    assert(a == b)
    assert(a != c)
    assert(a >= 0 && a < (1L << 32))
  }

  test("cosine: identity 1, orthogonality 0, scale invariance") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(2f, 4f, 6f), Seq(0f, 0f, 1f)))
      .toDF("a", "b", "z")
    def cos(x: String, y: String): Double = df.select(
      VectorOps.cosine(VectorOps.toDoubles(col(x)), VectorOps.toDoubles(col(y))))
      .as[Double].first()
    assert(math.abs(cos("a", "a") - 1.0) < 1e-12)
    assert(math.abs(cos("a", "b") - 1.0) < 1e-12)
    val az = cos("a", "z")
    assert(math.abs(az - 3.0 / math.sqrt(14.0)) < 1e-12)
  }

  test("planeWeightConst equals the Column-form planeWeight it replaced") {
    // lshBucket folds the LCG weights to double literals; this pins the
    // folded constants to the executable Column spec so neither copy
    // can drift silently
    val pairs = for (p <- 0 until 8; d <- Seq(0, 1, 31, 63)) yield (p, d)
    val viaColumn = spark.range(1).select(pairs.map { case (p, d) =>
      VectorOps.planeWeight(lit(p), lit(d), 64).as(s"w_${p}_$d")
    }: _*).first()
    pairs.zipWithIndex.foreach { case ((p, d), i) =>
      assert(viaColumn.getDouble(i) === VectorOps.planeWeightConst(p, d, 64),
        s"plane $p dim $d")
    }
  }

  test("lshBucket: deterministic, in range, sensitive to direction") {
    val df = Seq(
      (1L, Seq.fill(8)(1f)), (2L, Seq.fill(8)(1f)), (3L, Seq.fill(8)(-1f))
    ).toDF("id", "v")
    val got = df.select(col("id"),
      VectorOps.lshBucket(VectorOps.toDoubles(col("v")), 8, 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L)) // opposite vector flips every plane sign
    assert(got.values.forall(b => b >= 0 && b < 256))
  }

  test("bucketedPairsCosineAtLeast ⊆ all-pairs, identical cos_bp values") {
    Tables.ensureConf(spark)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = VectorOps.withNormalizedNative(e, "embedding", "vn")
      .select(col("vec_id"), col("vn"))
    // 4000 bp, not the registry's 4500: sf0.001 has no pair ≥ 0.45 that
    // also shares a 4-plane bucket, and an empty set would vacuously pass.
    val exact = VectorOps.allPairsCosineAtLeast(n, "vec_id", "vn", 4000L, 4)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val bucketed = VectorOps.bucketedPairsCosineAtLeast(
        n.withColumn("bucket", VectorOps.lshBucket(col("vn"), 4, 64)),
        "bucket", "vec_id", "vn", 4000L)
      .as[(Long, Long, Long)].collect()
    assert(bucketed.nonEmpty)
    // every bucketed pair exists in the exact set with the same value
    bucketed.foreach { case (a, b, bp) =>
      assert(exact.get((a, b)).contains(bp), s"($a,$b)=$bp not in exact")
    }
  }

  test("vocabHits and quality components") {
    val got = Seq("the cat and the hat").toDF("t")
      .select(TextOps.vocabHits(TextOps.words(col("t")), Seq("the", "and")))
      .as[Int].first()
    assert(got == 3)
    val bpe = Seq("ab 12 c.").toDF("t")
      .select(TextOps.bpeishTokenCount(col("t"))).as[Int].first()
    assert(bpe == 4)
    val zh = Seq("ab中文c").toDF("t")
      .select(TextOps.nonAsciiCount(col("t"))).as[Int].first()
    assert(zh == 2)
  }
}
