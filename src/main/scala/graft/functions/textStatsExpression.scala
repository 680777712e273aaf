package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character statistics for document profiling: ASCII punct /
  * digit / uppercase counts plus the subword-token count (runs of
  * letters, runs of digits, single other non-space chars — exactly the
  * BPE-ish pre-tokenizer's segment count). The composed form ran 4+
  * regex passes over each document; this is a single scan. */
case class TextStatsExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var punct = 0; var digit = 0; var upper = 0; var subwords = 0
    var i = 0
    var inAlpha = false; var inDigit = false
    while (i < s.length) {
      val c = s.charAt(i)
      val isAlpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val isDigit = c >= '0' && c <= '9'
      val isSpace = Character.isWhitespace(c)
      if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
          (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) punct += 1
      if (isDigit) digit += 1
      if (c >= 'A' && c <= 'Z') upper += 1
      if (isAlpha) { if (!inAlpha) subwords += 1 }
      else if (isDigit) { if (!inDigit) subwords += 1 }
      else if (!isSpace) subwords += 1
      inAlpha = isAlpha
      inDigit = isDigit
      i += 1
    }
    InternalRow(punct, digit, upper, subwords, s.length)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "text_stats"
}

object TextStatsFunctions {
  def text_stats(c: Column): Column = column(TextStatsExpression(expression(c)))
}
