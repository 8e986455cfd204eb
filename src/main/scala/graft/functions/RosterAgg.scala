package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mutable aggregation state for [[CappedRoster]]: the TRUE class
  * size, the strict minimum member id (the representative), and a
  * primitive-long roster that stops growing at cap+1 elements — enough
  * to hold every member of a below-cap class exactly (a class of
  * `cls <= cap` contributes at most `cap` ids across ALL partials),
  * while a mega class's buffer stays O(cap) instead of O(|class|).
  * Length cap+1 doubles as the overflow marker. */
final class RosterState(
    var cls: Long, var rep: Long, var n: Int, var ids: Array[Long])

/** `collect_list` + `count` + `min` fused into one native
  * TypedImperativeAggregate with a BOUNDED buffer — the kernel under
  * the mega-class guard (see `graft.ops.ClassGuard`). The hazard the
  * guard exists for is `collect_list`'s unbounded single-row roster on
  * a degenerate boilerplate class; the fix is to stop the roster at
  * cap+1 ids (the count keeps counting; the min keeps min-ing).
  *
  * Native (primitive long array state, manual byte serialization)
  * rather than a Scala `Aggregator`: the `udaf()` route costs an
  * encoder round-trip per input row and per shuffled partial, which
  * the interleaved A/B probe graded at ~20% of the whole jaccard
  * pipeline at sf0.1. This is the same execution family as
  * `collect_list` itself (ObjectHashAggregate, map-side partials), so
  * a mega class never concentrates raw members in one task: each map
  * task contributes one O(cap) buffer per class.
  *
  * Output: struct<cls: long, rep: long, ids: array<long>>. Null child
  * values are skipped (ids are never null in practice; parity with
  * collect_list which drops nulls).
  */
case class CappedRoster(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RosterState]
  with UnaryLike[Expression] {
  require(cap > 0, s"class cap must be positive, got $cap")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BIGINT id column, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cls", LongType, nullable = false),
    StructField("rep", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_capped_roster"

  override def createAggregationBuffer(): RosterState =
    new RosterState(0L, Long.MaxValue, 0, new Array[Long](8))

  private def append(s: RosterState, id: Long): Unit = {
    if (s.n <= cap) { // roster grows to at most cap+1 (overflow marker)
      if (s.n == s.ids.length) {
        val grown = new Array[Long](math.min(s.ids.length * 2, cap + 1))
        System.arraycopy(s.ids, 0, grown, 0, s.n)
        s.ids = grown
      }
      s.ids(s.n) = id
      s.n += 1
    }
  }

  override def update(s: RosterState, input: InternalRow): RosterState = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      s.cls += 1L
      if (id < s.rep) s.rep = id
      append(s, id)
    }
    s
  }

  override def merge(a: RosterState, b: RosterState): RosterState = {
    a.cls += b.cls
    if (b.rep < a.rep) a.rep = b.rep
    if (a.n <= cap) {
      if (b.n > cap) { a.ids = b.ids; a.n = b.n }
      else { var i = 0; while (i < b.n && a.n <= cap) { append(a, b.ids(i)); i += 1 } }
    }
    a
  }

  override def eval(s: RosterState): Any = new GenericInternalRow(Array[Any](
    s.cls, s.rep,
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(s.ids, s.n))))

  override def serialize(s: RosterState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 * s.n)
    bb.putLong(s.cls).putLong(s.rep).putInt(s.n)
    var i = 0
    while (i < s.n) { bb.putLong(s.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RosterState = {
    val bb = ByteBuffer.wrap(bytes)
    val cls = bb.getLong(); val rep = bb.getLong(); val n = bb.getInt()
    val ids = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { ids(i) = bb.getLong(); i += 1 }
    new RosterState(cls, rep, n, ids)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedRoster =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedRoster =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedRoster =
    copy(child = newChild)
}
