package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `image_dims(bytes)`: container-format sniff + dimensions from the
  * HEADER BYTES ONLY — PNG (IHDR), GIF87a/89a (logical screen), BMP
  * (BITMAPINFOHEADER), JPEG (first SOF0/1/2/3/5/6/7/9/10/11/13/14/15
  * marker scan). At 100 TB this is the point: a corpus triage pass
  * ("what formats, what resolutions, what's junk") must not DECODE
  * every payload — it reads ≤ a few dozen bytes per row where
  * [[graft.ops.Multimodal.ImageIoDecoder]] reads them all. The same
  * container-magic dispatch discipline as the workbook readers
  * (`sources/OrderedScan.scala`). Unrecognized, truncated or
  * non-image payloads return ("unknown", -1, -1) — a triage scan must
  * never kill the task on junk bytes. Returns struct(format STRING,
  * width INT, height INT); dimensions are what the header CLAIMS
  * (hostile headers lie — pair with a decode stage before trusting
  * them downstream). */
case class ImageDimsExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val (f, w, h) = ImageDimsExpression.sniff(b)
    InternalRow(UTF8String.fromString(f), w, h)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "image_dims"
}

object ImageDimsExpression {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** (format, width, height); ("unknown", -1, -1) when unrecognized. */
  def sniff(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return ("unknown", -1, -1)
    // PNG: 8-byte signature, IHDR is always the first chunk
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return ("png", be32(b, 16), be32(b, 20))
    // GIF87a/89a: logical screen descriptor, little-endian u16
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return ("gif", le16(b, 6), le16(b, 8))
    // BMP: BITMAPINFOHEADER; height may be negative (top-down rows)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return ("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // JPEG: scan segments for the first SOF marker
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return ("unknown", -1, -1)
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return ("unknown", -1, -1)
        val m = u8(b, j)
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (j + 8 < b.length) return ("jpeg", be16(b, j + 6), be16(b, j + 4))
          return ("unknown", -1, -1)
        }
        if (m == 0xd9 || m == 0xda) return ("unknown", -1, -1) // EOI/SOS before SOF
        if (j + 2 >= b.length) return ("unknown", -1, -1)
        val len = be16(b, j + 1)
        if (len < 2) return ("unknown", -1, -1)
        i = j + 1 + len
      }
      return ("unknown", -1, -1)
    }
    ("unknown", -1, -1)
  }
}

object MediaFunctions {
  def image_dims(c: Column): Column = column(ImageDimsExpression(expression(c)))
}
