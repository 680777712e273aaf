package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `subtitle_cues(text)`: SRT / WebVTT caption extraction — the
  * bridge from the video pipeline into the text one. A video crawl's
  * most valuable training text is its captions; this parses both
  * wire formats a crawl actually carries (SubRip: index line +
  * `HH:MM:SS,mmm --> HH:MM:SS,mmm`; WebVTT: `WEBVTT` magic, dot
  * milliseconds, optional cue identifiers and `MM:SS.mmm` short
  * timestamps, settings after the arrow ignored) into one cue array
  * — (cue_no, start_ms, end_ms, text with inner newlines preserved) —
  * ready for `posexplode` into the langid / quality / dedup stages.
  * Map-only, cue count capped ([[SubtitleCuesExpression.MaxCues]]);
  * unparseable or cue-less input → NULL, never a throw. Cues with
  * malformed timestamps are skipped (captions survive a bad cue the
  * way a crawl survives a bad record). */
case class SubtitleCuesExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cue_no", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("text", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    SubtitleCuesExpression.evalArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("cues")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $arr =
        graft.functions.SubtitleCuesExpression.evalArray($c);
      if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "subtitle_cues"
}

object SubtitleCuesExpression {

  /** Cue-count ceiling: a hostile million-cue payload stops here. */
  val MaxCues = 4096

  /** `HH:MM:SS,mmm`, `HH:MM:SS.mmm`, or `MM:SS.mmm` → millis, or -1. */
  private[graft] def parseTs(s: String): Long = {
    val t = s.trim
    val parts = t.split(":")
    if (parts.length < 2 || parts.length > 3) return -1L
    val secMs = parts(parts.length - 1).split("[.,]")
    if (secMs.length != 2) return -1L
    try {
      val hh = if (parts.length == 3) parts(0).trim.toLong else 0L
      val mm = parts(parts.length - 2).trim.toLong
      val ss = secMs(0).trim.toLong
      val ms = secMs(1).trim.toLong
      if (hh < 0 || mm < 0 || mm > 59 || ss < 0 || ss > 59 ||
          ms < 0 || ms > 999 || secMs(1).trim.length != 3) -1L
      else ((hh * 60 + mm) * 60 + ss) * 1000 + ms
    } catch { case _: NumberFormatException => -1L }
  }

  /** Codegen entry point; null = no parseable cues. */
  def evalArray(input: UTF8String): GenericArrayData = {
    if (input == null) return null
    val s = input.toString
    if (s.isEmpty) return null
    val lines = s.split("\r\n|\n|\r", -1)
    var i = 0
    val isVtt = lines.nonEmpty && lines(0).startsWith("WEBVTT")
    if (isVtt) i = 1
    val cues = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (i < lines.length && cues.length < MaxCues) {
      // skip blank separators (and VTT NOTE/STYLE blocks wholesale)
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length && isVtt &&
          (lines(i).startsWith("NOTE") || lines(i).trim == "STYLE")) {
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else if (i < lines.length) {
        // optional index / cue-identifier line before the arrow line
        var arrowAt = -1
        if (lines(i).contains("-->")) arrowAt = i
        else if (i + 1 < lines.length && lines(i + 1).contains("-->"))
          arrowAt = i + 1
        if (arrowAt < 0) {
          // not a cue block: skip this block to the next separator
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          val arrow = lines(arrowAt)
          val sides = arrow.split("-->")
          val start = if (sides.length >= 2) parseTs(sides(0)) else -1L
          // VTT allows settings after the end timestamp
          val endTok = if (sides.length >= 2)
            sides(1).trim.split("[ \t]")(0) else ""
          val end = parseTs(endTok)
          i = arrowAt + 1
          val text = new StringBuilder
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (text.nonEmpty) text.append('\n')
            text.append(lines(i))
            i += 1
          }
          if (start >= 0 && end >= start && text.nonEmpty)
            cues += InternalRow(cues.length, start, end,
              UTF8String.fromString(text.toString))
          // malformed cues are skipped, the stream continues
        }
      }
    }
    if (cues.isEmpty) null else new GenericArrayData(cues.toArray[Any])
  }
}

object SubtitleFunctions {
  def subtitle_cues(c: Column): Column =
    column(SubtitleCuesExpression(expression(c)))
}
