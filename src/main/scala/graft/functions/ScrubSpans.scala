package graft.functions

import graft.core.CodePoints

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Span replacement ("scrub"), the reference mixer's text rewrite
  * (/root/reference/src/shard.rs:371-444): given replacements
  * `(start, end, template)` sorted by start — offsets in Unicode code
  * points — rewrite the text. Template `{}` substitutes the original span
  * text (shard.rs:400-410); nested/overlapping spans collapse into the
  * first one (the `while span_index ... start < i` skip at shard.rs:412);
  * a span reaching EOF is flushed at the end (shard.rs:432-441).
  */
object SpanScrubber {

  final case class Replacement(start: Long, end: Long, template: String)

  /** Faithful port of the shard.rs char-walk. O(n + spans). */
  def scrub(text: String, replacementsUnsorted: Seq[Replacement]): String = {
    if (replacementsUnsorted.isEmpty) return text
    val replacements = replacementsUnsorted.sortBy(_.start).toIndexedSeq
    val sb = new java.lang.StringBuilder(text.length)
    var spanIndex = 0
    var i = 0L // code-point index
    var spanStartChar = 0 // utf-16 index of current span start
    var charIdx = 0 // utf-16 index
    val n = text.length
    while (charIdx < n) {
      val cp = text.codePointAt(charIdx)
      if (spanIndex < replacements.length) {
        val cur = replacements(spanIndex)
        val isInside = i >= cur.start && i < cur.end
        if (i == cur.start) spanStartChar = charIdx
        if (!isInside) {
          if (i == cur.end) {
            if (cur.template.nonEmpty) {
              sb.append(cur.template.replace("{}", text.substring(spanStartChar, charIdx)))
            }
            while (spanIndex < replacements.length && replacements(spanIndex).start < i)
              spanIndex += 1
          }
          if (spanIndex < replacements.length && replacements(spanIndex).start == i) {
            spanStartChar = charIdx
          } else {
            sb.appendCodePoint(cp)
          }
        }
      } else {
        sb.appendCodePoint(cp)
      }
      i += 1
      charIdx += Character.charCount(cp)
    }
    if (spanIndex < replacements.length && replacements(spanIndex).template.nonEmpty) {
      sb.append(replacements(spanIndex).template.replace("{}", text.substring(spanStartChar)))
    }
    sb.toString
  }

  /** Column API: scrub(text, spans) where `spans` is
    * `array<struct<start:long, end:long, template:string>>`. */
  def scrubSpans(text: Column, spans: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.toColumn(ScrubSpansExpr(Bridge.toExpr(text), Bridge.toExpr(spans)))
  }

  val replacementArrayType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType), StructField("end", LongType),
    StructField("template", StringType))))
}

/** Catalyst expression wrapping [[SpanScrubber.scrub]]. Null text → null;
  * null/empty span array → text unchanged. CodegenFallback: the inner loop
  * is already a tight JVM char-walk, codegen would only inline the call.
  */
case class ScrubSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val text = t.asInstanceOf[UTF8String].toString
    val arr = right.eval(input)
    if (arr == null) return UTF8String.fromString(text)
    val spans = arr.asInstanceOf[ArrayData]
    if (spans.numElements() == 0) return UTF8String.fromString(text)
    val reps = ArrayBuffer.empty[SpanScrubber.Replacement]
    var i = 0
    while (i < spans.numElements()) {
      val row = spans.getStruct(i, 3)
      if (row != null) {
        val tmpl = if (row.isNullAt(2)) "" else row.getUTF8String(2).toString
        reps += SpanScrubber.Replacement(row.getLong(0), row.getLong(1), tmpl)
      }
      i += 1
    }
    UTF8String.fromString(SpanScrubber.scrub(text, reps.toSeq))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
