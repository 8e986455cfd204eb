package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, as pure
  * higher-order-function expressions (no UDFs, stays in codegen).
  *
  * Scale design: cosine/dot are row-local; the expensive part of
  * similarity search is the candidate-pair space. The brute-force
  * top-k keeps the query side broadcast (queries × corpus never
  * shuffles the corpus); the LSH path buckets the corpus by
  * random-hyperplane signature so near-neighbor work is per-bucket.
  * Extension beyond the reference surface (it has no vector ops).
  */
object VectorOps {
  /** array<float> → array<double> (float widening is exact, so any
    * engine computing on the doubles agrees bit-for-bit). */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right dot product fold — deterministic accumulation
    * order, reproducible across engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic pseudo-random hyperplane weight for (plane p, dim d):
    * an LCG step on the index, mapped to [-0.5, 0.5). Integer part is
    * exact in any engine; the division by 2^31 is a power-of-two scale
    * (exact in IEEE double). */
  def planeWeight(p: Column, d: Column, dims: Int): Column =
    pmod(lit(1103515245L) * (p * dims + d + 1) + lit(12345L), lit(2147483648L))
      .cast("double") / lit(2.147483648e9) - lit(0.5)

  /** Random-hyperplane LSH bucket id (nPlanes bits): bit p is set iff
    * dot(v, plane_p) > 0. Row-local; one pass per plane. */
  def lshBucket(v: Column, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        sequence(lit(0), lit(dims - 1)), lit(0.0),
        (acc, d) => acc + element_at(v, d + 1) * planeWeight(lit(p), d, dims))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
