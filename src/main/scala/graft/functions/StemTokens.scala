package graft.functions

import graft.analysis.{Analyzers, PorterStemmer}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token analyzer tail (stopword removal + stemming) as a native
  * expression over the token array — replaces a Scala UDF that paid a
  * Catalyst Row <-> Seq[String] conversion per document. Eval-only
  * (CodegenFallback): the cost is in the stemmer itself, and the
  * expression avoids the serialization round trip entirely.
  *
  * `lang` selects the pipeline: "en" = English stopwords + Porter
  * stem; "it" = Italian elision + stopwords + light stem. Kept in
  * exact agreement with the driver-side `Analyzer.analyze` forms
  * (asserted by AnalyzersSpec "column and driver forms agree").
  */
case class StemTokens(child: Expression, lang: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = s"stem_tokens_$lang"

  @transient private lazy val perToken: String => Option[String] = lang match {
    case "en" => s =>
      if (Analyzers.EnglishStopwords.contains(s)) None
      else Some(PorterStemmer.stem(s))
    case "it" => s => Analyzers.italianPerToken(s)
    case other => throw new IllegalArgumentException(s"unknown stem lang '$other'")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        perToken(a.getUTF8String(i).toString) match {
          case Some(t) if t.nonEmpty => out += UTF8String.fromString(t)
          case _ =>
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): StemTokens =
    copy(child = newChild)
}

object StemTokens {
  /** Column wrapper (classic-API bridge). */
  def apply(c: Column, lang: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      StemTokens(org.apache.spark.sql.GraftColumnBridge.expression(c), lang))
}
