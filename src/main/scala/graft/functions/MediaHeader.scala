package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native media-header parse: `binary` payload →
  * `struct<format:string, width:int, height:int>` read from the
  * container's actual magic bytes, evaluated inside WholeStageCodegen.
  * Unlike [[DecodeFeatures]] (whose pixel-decode body is the sanctioned
  * stub — full codecs are not in this container), this expression is the
  * REAL thing end to end: the byte layouts parsed here are public,
  * stable container formats (PNG IHDR, the JPEG marker walk to SOFn,
  * GIF's logical screen descriptor, BMP's BITMAPINFOHEADER), and parsing
  * them needs no codec library — exactly the metadata extraction a
  * 100 TB media scan should run INSTEAD of decoding pixels to answer
  * dimension/format queries. Unrecognized or truncated payloads yield
  * NULL (not an error): a lake-wide scan meets garbage and must classify
  * it, not die on it.
  */
case class MediaHeader(child: Expression) extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = MediaHeaderKernel.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_header"

  override protected def nullSafeEval(input: Any): Any =
    MediaHeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaHeaderKernel.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}

/** Static parse kernel shared by generated Java and interpreted eval.
  * Formats (all public specifications):
  *  - PNG: 8-byte signature, then the IHDR chunk whose big-endian
  *    width/height sit at byte offsets 16 and 20.
  *  - JPEG: SOI (FF D8), then a marker walk over self-describing
  *    segments (2-byte big-endian length including itself) until a
  *    frame header SOFn (C0–CF minus C4/C8/CC), which carries
  *    precision(1), height(2 BE), width(2 BE). Fill bytes (repeated FF)
  *    are legal padding between segments; the walk stops at SOS/EOI.
  *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
  *    little-endian u16 width/height at offsets 6 and 8.
  *  - BMP: "BM", then BITMAPINFOHEADER's little-endian i32 width at 18
  *    and height at 22 (negative height = top-down row order → abs).
  */
object MediaHeaderKernel {

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Null if no known container signature matches or the header is
    * truncated/corrupt — public static, called from generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 89 'P' 'N' 'G' 0D 0A 1A 0A, IHDR must be the first chunk
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      return if (w <= 0 || h <= 0) null else row("png", w, h)
    }
    // JPEG: SOI then the marker walk
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced — not a JPEG stream
        var j = i
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // skip fill bytes
        if (j + 1 >= b.length) return null
        val marker = b(j) & 0xff
        if (marker == 0xd9 || marker == 0xda) return null // EOI/SOS before any SOF
        if (marker >= 0xd0 && marker <= 0xd7) { i = j + 1 } // RSTn: standalone
        else {
          if (j + 2 >= b.length) return null
          val len = be16(b, j + 1)
          if (len < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 7 >= b.length) return null
            val h = be16(b, j + 4); val w = be16(b, j + 6)
            return if (w <= 0 || h <= 0) null else row("jpeg", w, h)
          }
          i = j + 1 + len
        }
      }
      return null
    }
    // GIF: "GIF87a" / "GIF89a"
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      return if (w <= 0 || h <= 0) null else row("gif", w, h)
    }
    // BMP: "BM" + BITMAPINFOHEADER
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18); val h = math.abs(le32(b, 22))
      return if (w <= 0 || h <= 0) null else row("bmp", w, h)
    }
    null
  }
}
