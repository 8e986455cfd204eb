package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point for cluster deployments:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects the native vector expressions into every session built from
  * that config (the in-process path uses VectorExpressions.register).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import VectorExpressions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) =
      new ExpressionInfo(VectorExpressions.getClass.getCanonicalName, name)
    ext.injectFunction((FunctionIdentifier("graft_dot"), info("graft_dot"),
      (es: Seq[Expression]) => ArrayDotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_scale_div"),
      info("graft_scale_div"),
      (es: Seq[Expression]) => ArrayScaleDivide(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_quantize"),
      info("graft_quantize"),
      (es: Seq[Expression]) => QuantizeStats(es.head)))
    def binfo(name: String) =
      new ExpressionInfo(BloomFunctions.getClass.getCanonicalName, name)
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      binfo("graft_bloom_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      binfo("graft_bloom_contains"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
    def tinfo(name: String) =
      new ExpressionInfo(TextExpressions.getClass.getCanonicalName, name)
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      tinfo("graft_minhash"),
      (es: Seq[Expression]) => TextExpressions.MinHashSignature(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      tinfo("graft_shingle_hashes"),
      (es: Seq[Expression]) => TextExpressions.ShingleHashes(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_word_hashes60"),
      tinfo("graft_word_hashes60"),
      (es: Seq[Expression]) => TextExpressions.WordHashes60(es.head)))
  }
}
