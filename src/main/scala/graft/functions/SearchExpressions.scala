package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the search engine's hot path.
  *
  * The per-document term-frequency probe is the innermost loop of the
  * scan-path scorer (reference analog: the Lucene postings read in
  * LuceneIndex.scala:62-74). A Scala UDF would box every row; a
  * higher-order `filter(tokens, ...)` stays interpreted per element.
  * These expressions participate in whole-stage codegen instead.
  */

/** `array_count_eq(tokens, term)` — number of occurrences of `term`
  * in an `array<string>` column. Codegen: tight loop over the unsafe
  * array, no allocation. */
case class ArrayCountEq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_eq"

  override protected def nullSafeEval(arr: Any, term: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val t = term.asInstanceOf[UTF8String]
    var i = 0
    var n = 0
    val len = a.numElements()
    while (i < len) {
      if (!a.isNullAt(i) && a.getUTF8String(i).equals(t)) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, term) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i) && $arr.getUTF8String($i).equals($term)) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCountEq =
    copy(left = newLeft, right = newRight)
}

/** `phrase_count(tokens, phrase)` — number of starting positions where
  * the `phrase` array occurs contiguously inside `tokens` (overlapping
  * occurrences each count, matching positional phrase freq semantics;
  * reference analog: MatchPhraseQuery via Lucene createPhraseQuery,
  * dsl/DslQuery.scala:116-120). */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "phrase_count"

  override protected def nullSafeEval(arr: Any, phr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val p = phr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = p.numElements()
    if (m == 0 || m > n) return 0
    var count = 0
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (a.isNullAt(i + j) || p.isNullAt(j) ||
          !a.getUTF8String(i + j).equals(p.getUTF8String(j))) ok = false
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, phr) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |int $cnt = 0;
         |int $n = $arr.numElements();
         |int $m = $phr.numElements();
         |if ($m > 0 && $m <= $n) {
         |  for (int $i = 0; $i <= $n - $m; $i++) {
         |    boolean $ok = true;
         |    for (int $j = 0; $ok && $j < $m; $j++) {
         |      if ($arr.isNullAt($i + $j) || $phr.isNullAt($j) ||
         |          !$arr.getUTF8String($i + $j).equals($phr.getUTF8String($j))) {
         |        $ok = false;
         |      }
         |    }
         |    if ($ok) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseCount =
    copy(left = newLeft, right = newRight)
}

/** `vec_dot(a, b)` — dot product of two `array<double>` columns in a
  * tight codegen loop (sequential accumulation, so results are
  * bit-identical to a left fold — required for oracle parity). The
  * hot inner loop of every cosine-similarity operator; an interpreted
  * higher-order `aggregate(zip_with(...))` is ~10x slower. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object SearchExpressions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ArrayCountEq].getName, null, name, usage, "")

  /** Registers the expressions in the session's FunctionRegistry so
    * they are callable from both `functions.call_function` and SQL
    * text (SURVEY §7 Phase 3). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("array_count_eq"),
      info("array_count_eq", "array_count_eq(arr, term) - occurrences of term in arr"),
      (exprs: Seq[Expression]) => ArrayCountEq(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("phrase_count"),
      info("phrase_count", "phrase_count(arr, phrase) - contiguous occurrences of phrase in arr"),
      (exprs: Seq[Expression]) => PhraseCount(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)))
  }
}
