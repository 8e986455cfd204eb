package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd k-means training — the IVF coarse quantizer's missing half
  * (q_ann_ivf_topk buckets by fixed random hyperplanes; real IVF
  * trains its cells). Extension beyond the reference surface.
  *
  * Distributed shape (the one that holds at 100 TB):
  *  - assignment is ROW-LOCAL: centroids are folded into the plan as
  *    literals (k·dims doubles), so the corpus never shuffles and the
  *    metric stays in whole-stage codegen;
  *  - the update is ONE map-side-combinable shuffle: groupBy(cluster)
  *    over dims+1 long sums — each task contributes k rows of partial
  *    sums to the exchange;
  *  - only k centroid rows ever reach the driver (the legitimate Lloyd
  *    collect); iterations are sequential actions by nature.
  *
  * Cross-engine determinism (why an exact DuckDB oracle is possible at
  * all): parallel double summation is order-dependent, so centroid
  * updates aggregate QUANTIZED INTEGER vectors — integer sums commute,
  * so partial aggregation order cannot perturb them. The assignment
  * metric (v·c − |c|²/2, the argmin-L2 form without the constant |v|²)
  * is then evaluated in doubles derived from those exact integers with
  * a fixed left-assoc formula, so both engines compute bit-identical
  * values. Ties pick the smallest cluster id; an emptied cluster keeps
  * its previous centroid.
  */
object KMeans {
  /** Quantize a (normalized) double vector to integer thousandths —
    * unrolled, codegen'd; `round` is HALF_UP in both engines. */
  def quantizeUnrolled(v: Column, dims: Int, scale: Int = 1000): Column =
    array((1 to dims).map(i =>
      round(element_at(v, i) * scale).cast("long")): _*)

  /** Centroid j: mean vector (doubles) + precomputed |c|²/2. */
  final case class Centroid(j: Int, c: Array[Double], halfNorm: Double)

  private def halfNormOf(c: Array[Double]): Double = {
    var ss = 0.0
    var i = 0
    while (i < c.length) { ss += c(i) * c(i); i += 1 }
    ss / 2
  }

  /** Seeds: the quantized vectors of the k smallest ids, cluster id =
    * rank in that order (deterministic at any partitioning). */
  def seedCentroids(df: DataFrame, vqCol: String, idCol: String, k: Int): Seq[Centroid] = {
    val rows = df.select(col(idCol), col(vqCol)).orderBy(col(idCol).asc)
      .limit(k).collect()
    rows.zipWithIndex.map { case (r, j) =>
      val c = r.getSeq[Long](1).map(_.toDouble).toArray
      Centroid(j, c, halfNormOf(c))
    }.toSeq
  }

  /** Append `out` = argmax_j (vq·c_j − hn_j), smallest j on ties.
    * Two stacked projections: the wide per-centroid metrics first
    * (plain attribute refs only — the repo's no-nested-wide-expressions
    * rule), then the strict-greater fold over the narrow metric
    * columns, which keeps the earliest (= smallest) index on ties. */
  def assign(df: DataFrame, vqCol: String, cents: Seq[Centroid], out: String): DataFrame = {
    val sorted = cents.sortBy(_.j)
    require(sorted.map(_.j) == sorted.indices, "centroid ids must be 0..k-1")
    val metrics = sorted.map { ct =>
      (1 to ct.c.length).map(i => element_at(col(vqCol), i) * lit(ct.c(i - 1)))
        .reduceLeft(_ + _) - lit(ct.halfNorm)
    }
    val mCols = metrics.indices.map(j => s"__m$j")
    val withM = df.select(
      col("*") +: metrics.zipWithIndex.map { case (m, j) => m.as(s"__m$j") }: _*)
    val best = metrics.indices.tail.foldLeft((col("__m0"), lit(0))) {
      case ((bm, bj), j) =>
        (when(col(s"__m$j") > bm, col(s"__m$j")).otherwise(bm),
          when(col(s"__m$j") > bm, lit(j)).otherwise(bj))
    }
    withM.withColumn(out, best._2).drop(mCols: _*)
  }

  /** One centroid update: per-cluster integer sums (order-independent)
    * + counts; k rows collected. Clusters absent from `df` keep their
    * entry from `prev`. */
  def updateCentroids(df: DataFrame, vqCol: String, clusterCol: String,
      dims: Int, prev: Seq[Centroid]): Seq[Centroid] = {
    val aggs = count(lit(1)).as("__n") +:
      (1 to dims).map(i => sum(element_at(col(vqCol), i)).as(s"__s$i"))
    val fresh = df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val j = r.getInt(0)
        val n = r.getLong(1)
        val c = Array.tabulate(dims)(i => r.getLong(i + 2).toDouble / n)
        j -> Centroid(j, c, halfNormOf(c))
      }.toMap
    prev.map(p => fresh.getOrElse(p.j, p))
  }

  /** Training only: seed → (assign → update) × (iters − 1); returns
    * the final centroids (what PQ needs to build ADC tables without
    * re-deriving them from the assignment output). */
  def lloydTrain(df: DataFrame, vqCol: String, idCol: String, k: Int,
      dims: Int, iters: Int): Seq[Centroid] = {
    var cents = seedCentroids(df, vqCol, idCol, k)
    var i = 0
    while (i < iters - 1) {
      cents = updateCentroids(assign(df, vqCol, cents, "__a"), vqCol, "__a", dims, cents)
      i += 1
    }
    cents
  }

  /** Full training run: seed → (assign → update) × iters → final
    * assignment appended as `out`. Input must already carry the
    * quantized vector column (see [[quantizeUnrolled]]). */
  def lloydAssign(df: DataFrame, vqCol: String, idCol: String, k: Int,
      dims: Int, iters: Int, out: String): DataFrame = {
    val cents = lloydTrain(df, vqCol, idCol, k, dims, iters)
    assign(df, vqCol, cents, out)
  }
}
