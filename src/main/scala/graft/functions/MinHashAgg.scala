package graft.functions

import graft.ops.TextOps.{MinhashA, MinhashB, P}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed Aggregator — the mergeable-sketch
  * formulation: state is the running k-vector of minima, `reduce`
  * folds one token hash, `merge` is elementwise min, so signatures
  * combine across partitions with map-side partial aggregation. This
  * is the shape that scales to streaming updates and sketch unions;
  * the row-local fold (TextOps.minhashSignature) computes the same
  * values over an already-collected token array.
  *
  * Arithmetic is identical to minhashSignature: mh_i = min over h of
  * (a_i*h + b_i) mod P, h in [0, P) so no negative-mod cases.
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  private val k = MinhashA.length

  override def zero: Array[Long] = Array.fill(k)(P)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (MinhashA(i) * h + MinhashB(i)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
