package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for multi-dimensional data skipping.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * sorting a table by the Morton (z-order) interleave of its two
  * hottest filter dimensions clusters rows so that ANY contiguous
  * slice — a parquet row group, a file — has a bounded min/max
  * envelope in BOTH dimensions, which turns ordinary parquet
  * statistics into a 2-D prune. This is layout-time work: one range
  * shuffle at write, zero cost at read. */
object Layout {
  /** Morton interleave of two dims, 16 bits each → one 32-bit curve
    * value. Unrolled constant-shift sum: 32 integer terms the codegen
    * collapses into straight-line bytecode — no higher-order lambdas
    * (interpreted, per DEVLOG r1), no UDF. Inputs must already be in
    * [0, 65535]; normalize first (see q_zorder_cluster). */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` range-partitioned and sorted by the given z column
    * expression: files (and row groups within them) then cover
    * disjoint z ranges, so both interleaved dimensions carry bounded
    * per-file min/max stats. One range shuffle (sampled boundaries),
    * local sort, no global sort barrier. */
  def clusteredWrite(df: DataFrame, z: Column, nParts: Int, path: String): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
