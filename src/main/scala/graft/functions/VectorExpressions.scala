package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector hot path.
  *
  * Why custom expressions (tier (b) of the extension ladder) instead
  * of composed built-ins: a 64-dim dot product written as built-ins is
  * either a higher-order `aggregate` (interpreted per element) or 64
  * `element_at` terms (codegen'd, but 128 bounds/null checks and a
  * 129-node expression tree per use site). With `doGenCode` the whole
  * product is one `for` loop over the two `ArrayData` buffers inside
  * whole-stage codegen. Accumulation is the same left-assoc order as
  * the unrolled form, so results are bit-identical and the DuckDB
  * oracles keep matching.
  *
  * Element nulls are not checked (embedding vectors are dense by
  * construction); a null ARRAY input yields null via BinaryExpression's
  * default null-intolerant path.
  */
object VectorExpressions {
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** dot(a, b): float/double arrays → double; mixed widths widen
    * exactly. */
  case class ArrayDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(left.dataType) && isVec(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val lf = elemType(left) == FloatType; val rf = elemType(right) == FloatType
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv; i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
        }
        ${ev.value} = $s;
        """
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** a / scalar, element-wise: float/double array → double array.
    * Used for L2 normalization (divide by the precomputed norm). */
  case class ArrayScaleDivide(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(left.dataType) && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, double), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_scale_div"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val d = b.asInstanceOf[Double]
      val lf = elemType(left) == FloatType
      val n = x.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) / d
        i += 1
      }
      ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val arr = ctx.freshName("arr")
        s"""
        int $n = $a.numElements();
        double[] $arr = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $arr[$i] = ((double) $a.$get($i)) / $b;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($arr);
        """
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent session-level registration; `call_function` then makes
    * the expressions usable from the Column API without depending on
    * version-specific Column internals. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def reg2(name: String, build: Seq[Expression] => Expression): Unit = {
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(
          id,
          new ExpressionInfo(VectorExpressions.getClass.getCanonicalName, name),
          (exprs: Seq[Expression]) => {
            require(exprs.length == 2, s"$name expects 2 arguments")
            build(exprs)
          })
      }
    }
    reg2("graft_dot", es => ArrayDotProduct(es(0), es(1)))
    reg2("graft_scale_div", es => ArrayScaleDivide(es(0), es(1)))
  }
}
