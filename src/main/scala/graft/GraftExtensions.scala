package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayCountEq, PhraseCount, VecDot}

/** SparkSessionExtensions entry point (SURVEY §7 Phase 3): makes the
  * engine's native expressions available in every session via
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so `SELECT array_count_eq(tokens, 'spark')`, `phrase_count`, and
  * `vec_dot` work from pure SQL without programmatic registration
  * (which `SearchExpressions.register` still provides per session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ArrayCountEq].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_count_eq"),
      info("array_count_eq", "array_count_eq(arr, term) - occurrences of term in arr"),
      (exprs: Seq[Expression]) => ArrayCountEq(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("phrase_count"),
      info("phrase_count", "phrase_count(arr, phrase) - contiguous occurrences"),
      (exprs: Seq[Expression]) => PhraseCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.functions.NativeCountRewrite)
  }
}
