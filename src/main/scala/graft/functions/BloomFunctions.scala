package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's runtime-filter Bloom machinery, surfaced as session
  * functions. BloomFilterAggregate / BloomFilterMightContain are the
  * codegen'd internals behind Spark's own runtime row-level filtering
  * (InjectRuntimeFilter); they are not in the public registry, so we
  * register them the same way as the graft native expressions. Inputs
  * must be xxhash64-hashed longs — the same convention Spark's
  * injected filters use.
  *
  * graft_bloom_agg(xxhash64(k), estimatedItems, numBits) → binary
  * graft_bloom_contains(bloom, xxhash64(k)) → boolean (no false
  * negatives; false positives bounded by numBits/estimatedItems).
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def regN(name: String, arity: Int, build: Seq[Expression] => Expression): Unit = {
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(
          id,
          new ExpressionInfo(BloomFunctions.getClass.getCanonicalName, name),
          (exprs: Seq[Expression]) => {
            require(exprs.length == arity, s"$name expects $arity arguments")
            build(exprs)
          })
      }
    }
    regN("graft_bloom_agg", 3,
      es => new BloomFilterAggregate(es(0), es(1), es(2)).toAggregateExpression())
    regN("graft_bloom_contains", 2,
      es => BloomFilterMightContain(es(0), es(1)))
  }
}
