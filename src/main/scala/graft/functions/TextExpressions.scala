package graft.functions

import graft.ops.TextOps
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for the MinHash hot path.
  *
  * The row-local signature was a stack of 8 higher-order `aggregate`
  * folds (one per permutation), each interpreted per element — 8×|set|
  * interpreted lambda frames per document. Here all 8 mins come out of
  * ONE generated loop over the hash array, inside whole-stage codegen.
  * Arithmetic is identical to the fold ((a_i*h + b_i) mod P, running
  * min, empty set → P), so signatures are bit-identical to both the
  * fold and the `MinHashAgg` Aggregator (PropertySpec cross-checks),
  * and the DuckDB oracles keep matching.
  *
  * Inputs are `stringHash` values (non-negative, < P), so a_i*h + b_i
  * stays well under 2^63 and plain Java `%` equals `pmod`.
  */
object TextExpressions {
  /** minhash(hashes: array<long>) → array<long> of k signature mins. */
  case class MinHashSignature(child: Expression) extends UnaryExpression {
    private val k = TextOps.MinhashA.length

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got ${dt.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    override protected def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(TextOps.P)
      val n = xs.numElements()
      var i = 0
      while (i < n) {
        val h = xs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (TextOps.MinhashA(j) * h + TextOps.MinhashB(j)) % TextOps.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      ArrayData.toArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val h = ctx.freshName("h"); val v = ctx.freshName("v")
        val m = ctx.freshName("mins")
        val p = TextOps.P
        val perPerm = TextOps.MinhashA.zip(TextOps.MinhashB).zipWithIndex.map {
          case ((av, bv), j) =>
            s"""long $v$j = (${av}L * $h + ${bv}L) % ${p}L;
               if ($v$j < $m[$j]) $m[$j] = $v$j;"""
        }.mkString("\n")
        s"""
        long[] $m = new long[$k];
        java.util.Arrays.fill($m, ${p}L);
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          $perPerm
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($m);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Idempotent session-level registration (same pattern as
    * [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("graft_minhash")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(TextExpressions.getClass.getCanonicalName, "graft_minhash"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "graft_minhash expects 1 argument")
          MinHashSignature(exprs.head)
        })
    }
  }
}
