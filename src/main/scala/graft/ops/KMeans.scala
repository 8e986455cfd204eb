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

  /** The native form of [[quantizeUnrolled]] at scale 1000 over the
    * whole vector (graft_quantize1000): bit-identical values
    * (PropertySpec pins it), but one compact generated loop instead of
    * 64 inlined round+cast trees — the unrolled form pushed any stage
    * that also carries an assignment kernel past HotSpot's
    * DontCompileHugeMethods limit, leaving the hot k·dims loops
    * INTERPRETED (round-13 P41: the whole PQ encode cost). */
  def quantize1000(v: Column): Column = call_function("graft_quantize1000", v)

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
    * One native expression call (graft_lloyd_assign): the centroid
    * matrix ships as a single foldable literal and the generated code
    * is two short loops, constant-size in k·dims. The previous
    * unrolled-projection form generated k·dims product nodes per use
    * site; with 4 PQ subspaces its codegen COMPILATION dominated the
    * query (~2.5 s at sf0.001 and sf0.1 alike — fixed cost, not data).
    * Arithmetic order is unchanged (left-assoc dot, ascending-j
    * strict-greater selection), so assignments are bit-identical. */
  def assign(df: DataFrame, vqCol: String, cents: Seq[Centroid], out: String): DataFrame = {
    val sorted = cents.sortBy(_.j)
    require(sorted.map(_.j) == sorted.indices, "centroid ids must be 0..k-1")
    df.withColumn(out,
      call_function("graft_lloyd_assign", col(vqCol),
        typedLit(sorted.map(_.c.toSeq))))
  }

  /** All M subspace assignments from the FULL quantized vector in ONE
    * native kernel call: `outCols(m)` = argmax_j (vq[m·sub ..] · c_mj −
    * hn_mj), ties to the smallest j. Bit-identical to M chained
    * [[assign]] calls over `slice(vq, m·sub+1, sub)` — same ascending
    * left-assoc arithmetic, same selection — but the quantized-vector
    * subtree is evaluated once per row instead of once per subspace
    * (round-13 P41: the collapsed per-subspace assigns re-inlined the
    * 64-`round()` quantize tree into every code column, and Spark's
    * `round` is a BigDecimal per element even in codegen — the
    * duplication WAS the PQ encode's cost). A functions.PropertySpec
    * test pins multi == chained. */
  def assignMulti(df: DataFrame, vqCol: String, books: Seq[Seq[Centroid]],
      outCols: Seq[String]): DataFrame = {
    require(books.length == outCols.length, "one output column per subspace")
    val sorted = books.map(_.sortBy(_.j))
    sorted.foreach(b => require(b.map(_.j) == b.indices, "centroid ids must be 0..k-1"))
    require(!df.columns.contains("__codes"),
      "assignMulti stages the kernel in a temp column named __codes; " +
        "rename the caller's __codes column first (round-14 ADVICE guard)")
    val codes = call_function("graft_lloyd_assign_multi", col(vqCol),
      typedLit(sorted.map(_.map(_.c.toSeq))))
    // two-step projection: the kernel lands in its own column first, so
    // the (cheap) element_at extractors reference it without CollapseProject
    // duplicating the kernel per output column
    df.withColumn("__codes", codes)
      .select(df.columns.map(col).toSeq ++ outCols.zipWithIndex.map {
        case (o, m) => element_at(col("__codes"), lit(m + 1)).as(o) }: _*)
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

  /** Multi-subspace seeds in ONE action: every vq column of the k
    * smallest ids, from a single TakeOrdered. Values are identical to
    * M separate [[seedCentroids]] calls — it is the same rows. */
  def seedCentroidsMulti(df: DataFrame, vqCols: Seq[String], idCol: String,
      k: Int): Seq[Seq[Centroid]] = {
    val rows = df.select(col(idCol) +: vqCols.map(col): _*)
      .orderBy(col(idCol).asc).limit(k).collect()
    vqCols.indices.map { m =>
      rows.zipWithIndex.map { case (r, j) =>
        val c = r.getSeq[Long](m + 1).map(_.toDouble).toArray
        Centroid(j, c, halfNormOf(c))
      }.toSeq
    }
  }

  /** Every subspace's centroid update in ONE pass over `df` — the
    * shape that matters for PQ training at corpus scale: M
    * independent [[updateCentroids]] calls re-read the input M times
    * per Lloyd iteration, this reads it once. Rows explode row-locally
    * to (subspace, cluster, subvector); the single combinable
    * groupBy(m, cluster) shuffle carries the same integer partial
    * sums the per-subspace form would (sums of the same integers in
    * any order — exact), and M·k rows reach the driver. */
  def updateCentroidsMulti(df: DataFrame, vqCols: Seq[String],
      clusterCols: Seq[String], dims: Int,
      prevs: Seq[Seq[Centroid]]): Seq[Seq[Centroid]] = {
    require(vqCols.length == clusterCols.length && vqCols.length == prevs.length)
    val entries = vqCols.zip(clusterCols).zipWithIndex.map { case ((vq, cl), m) =>
      struct(lit(m).as("m"), col(cl).as("c"), col(vq).as("v"))
    }
    val exploded = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.m").as("__m"), col("e.c").as("__c"), col("e.v").as("__v"))
    val aggs = count(lit(1)).as("__n") +:
      (1 to dims).map(i => sum(element_at(col("__v"), i)).as(s"__s$i"))
    val fresh = exploded.groupBy(col("__m"), col("__c")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val m = r.getInt(0); val j = r.getInt(1); val n = r.getLong(2)
        val c = Array.tabulate(dims)(i => r.getLong(i + 3).toDouble / n)
        (m, j) -> Centroid(j, c, halfNormOf(c))
      }.toMap
    prevs.zipWithIndex.map { case (prev, m) =>
      prev.map(p => fresh.getOrElse((m, p.j), p))
    }
  }

  /** Lloyd training over M subspaces jointly: one seed action + one
    * corpus pass per iteration (vs M of each when trained one
    * subspace at a time). Centroid values are bit-identical to M
    * separate [[lloydTrain]] runs — the subspaces never mix, they
    * just share passes. */
  def lloydTrainMulti(df: DataFrame, vqCols: Seq[String], idCol: String,
      k: Int, dims: Int, iters: Int): Seq[Seq[Centroid]] = {
    var cents = seedCentroidsMulti(df, vqCols, idCol, k)
    var i = 0
    while (i < iters - 1) {
      var cur = df
      vqCols.indices.foreach { m =>
        cur = assign(cur, vqCols(m), cents(m), s"__a$m")
      }
      cents = updateCentroidsMulti(cur, vqCols,
        vqCols.indices.map(m => s"__a$m"), dims, cents)
      i += 1
    }
    cents
  }

  /** IVF cells (kCells centroids over the full `vqFull` vector) and M
    * PQ codebooks (kBooks centroids per `vqCols` subspace) trained
    * JOINTLY in the fewest driver actions — the IVF-PQ chain's
    * training used 4 sequential jobs (2 seeds + 2 updates) where 2
    * suffice (round 13): ONE seed collect serves both (the cell seeds
    * are exactly the first kCells rows of the kBooks-row id-ordered
    * prefix, so values match separate seedCentroids calls), and each
    * round's two update aggregates are independent jobs over the same
    * cached input, so they run CONCURRENTLY (the optimization guide's
    * overlap-independent-jobs pattern) — same aggregates, same
    * integer sums, just overlapped wall clock. Requires
    * kBooks >= kCells. `cellIters` / `bookIters` are SEPARATE on
    * purpose (round-14 ADVICE): the pre-joint form hardcoded 2 cell
    * rounds while books took PqIters, and a single shared parameter
    * would silently move the IVF cell centroids (and every downstream
    * recall result) if PqIters were ever bumped. Rounds where only one
    * side still trains run that side's update alone. */
  def lloydTrainJoint(df: DataFrame, vqFull: String, idCol: String,
      dims: Int, kCells: Int, vqCols: Seq[String], sub: Int, kBooks: Int,
      cellIters: Int, bookIters: Int): (Seq[Centroid], Seq[Seq[Centroid]]) = {
    require(kBooks >= kCells,
      "joint seeding takes the cell seeds from the book-seed prefix")
    val seeds = seedCentroidsMulti(df, vqFull +: vqCols, idCol, kBooks)
    var cells = seeds.head.take(kCells)
    var books = seeds.tail
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    var i = 0
    while (i < math.max(cellIters, bookIters) - 1) {
      val c0 = cells; val b0 = books
      val cellsF = if (i < cellIters - 1) Some(Future {
        updateCentroids(assign(df, vqFull, c0, "__ac"), vqFull, "__ac", dims, c0)
      }) else None
      val booksF = if (i < bookIters - 1) Some(Future {
        var cur = df
        vqCols.indices.foreach { m =>
          cur = assign(cur, vqCols(m), b0(m), s"__a$m")
        }
        updateCentroidsMulti(cur, vqCols,
          vqCols.indices.map(m => s"__a$m"), sub, b0)
      }) else None
      cellsF.foreach(f => cells = Await.result(f, Duration.Inf))
      booksF.foreach(f => books = Await.result(f, Duration.Inf))
      i += 1
    }
    (cells, books)
  }
}
