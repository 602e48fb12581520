package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Uncompressed-BMP pixel extraction — the one image format whose
  * pixels are recoverable with pure byte arithmetic (no codec library,
  * which this container doesn't ship): BITMAPFILEHEADER + a ≥40-byte
  * BITMAPINFOHEADER + a padded BGR pixel array is the entire public
  * layout. This makes the pHash pipeline fully REAL for BMP payloads —
  * decoded luminance feeds the 8×8 tile instead of the stride-sampled
  * stand-in ([[PHashKernel.hash]]) that opaque/compressed payloads
  * still get.
  *
  * Layout walked (all little-endian):
  *  - bytes 0-1  `BM` magic; byte 10 the pixel-array OFFSET (honored,
  *    never assumed 54 — writers pad gap bytes after the headers);
  *  - byte 14 info-header size (≥40 accepted: V4/V5 headers extend,
  *    never move, these fields); 18 width (signed); 22 height (signed —
  *    POSITIVE means bottom-up rows, NEGATIVE top-down, both real);
  *  - byte 28 bits-per-pixel (only 24 supported — the uncompressed
  *    truecolor case); 30 compression (0 = BI_RGB required);
  *  - rows padded to 4-byte multiples, pixels stored B,G,R.
  *
  * Luminance is the integer ITU-R BT.601 weighting
  * `(77·R + 150·G + 29·B) >> 8` (77+150+29 = 256, so lum ∈ [0, 255]),
  * and the 8×8 tile box-filters pixel (x, y) into cell
  * `(8·(y·8/h) + x·8/w)` with integer division — every step replays
  * exactly in the DuckDB oracle. Unparseable payloads → null (the
  * header-parse NULL contract of [[MediaHeaderKernel]]).
  */
object BmpKernel {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Parsed 24-bpp uncompressed BMP: width, height, and the row-major
    * TOP-DOWN luminance plane (the row order the tile and every oracle
    * formula use, whatever order the file stored). Null if the payload
    * is not a parseable 24-bpp BI_RGB BMP. */
  def lumaPlane(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le32(b, 10)
    if (le32(b, 14) < 40) return null
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || le16(b, 28) != 24 || le32(b, 30) != 0) return null
    val rowStride = ((w * 3 + 3) / 4) * 4
    if (dataOffset < 54 ||
        dataOffset.toLong + rowStride.toLong * h > b.length) return null
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      val base = dataOffset + fileRow * rowStride
      var x = 0
      while (x < w) {
        val i = base + x * 3
        val bb = b(i) & 0xff
        val g = b(i + 1) & 0xff
        val r = b(i + 2) & 0xff
        lum(y * w + x) = (77 * r + 150 * g + 29 * bb) >> 8
        x += 1
      }
      y += 1
    }
    (w, h, lum)
  }

  /** 8×8 box-filtered luminance tile (row-major, 64 cells) — pHash's
    * input. Pixel (x, y) lands in cell `(y·8/h, x·8/w)`; each cell is
    * the integer mean of its pixels. Requires w ≥ 8 and h ≥ 8 (every
    * cell non-empty — a thumbnail smaller than the tile has nothing to
    * average). Null when unparseable or too small. */
  def lumaTile(b: Array[Byte]): Array[Long] = {
    val plane = lumaPlane(b)
    if (plane == null) return null
    val (w, h, lum) = plane
    if (w < 8 || h < 8) return null
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val ty = y * 8 / h
      var x = 0
      while (x < w) {
        val cell = 8 * ty + x * 8 / w
        sum(cell) += lum(y * w + x)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](64)
    var k = 0
    while (k < 64) { out(k) = sum(k) / cnt(k); k += 1 }
    out
  }

  /** Codegen entry: Tungsten array or null. */
  def lumaTileUnsafe(b: Array[Byte]): UnsafeArrayData = {
    val t = lumaTile(b)
    if (t == null) null else UnsafeArrayData.fromPrimitiveArray(t)
  }

  /** Real-pixel pHash: decoded-luminance tile → the shared DCT/pack
    * ([[PHashKernel.hashTile]]). MIN_VALUE marks unparseable (surfaces
    * as SQL NULL through the expression — same sentinel contract as
    * [[PHashKernel.hash]]). */
  def phash(b: Array[Byte]): Long = {
    val t = lumaTile(b)
    if (t == null) Long.MinValue else PHashKernel.hashTile(t)
  }
}

/** Deterministic 24-bpp BMP payloads for the test corpus (which ships
  * no binary media) — the [[graft.operators.Multimodal
  * .synthesizeImagePayloads]] contract extended to a format whose
  * PIXELS round-trip: real file bytes whose pixel values derive from
  * `(doc_id, x, y)` so the DuckDB oracle predicts the decoded plane
  * from the formula without parsing a byte. The encodings vary
  * adversarially so a parser shortcut cannot cancel against the
  * writer: some files store rows top-down (negative height), some pad
  * gap bytes before the pixel array (offset ≠ 54), and every 13th doc
  * is garbage (NULL-contract row) — yet all valid files decode to the
  * SAME formula plane, which is exactly what the oracle asserts. */
object BmpSynthKernel {

  def width(id: Long): Int = (8 + Math.floorMod(id, 17L)).toInt
  def height(id: Long): Int = (8 + Math.floorMod(id, 11L)).toInt

  /** The pixel formula — channel values the oracle re-derives in SQL. */
  def red(id: Long, x: Int, y: Int): Int =
    Math.floorMod(id * 3 + x * 7 + y * 11, 256L).toInt
  def green(id: Long, x: Int, y: Int): Int =
    Math.floorMod(id * 5 + x * 13 + y * 17, 256L).toInt
  def blue(id: Long, x: Int, y: Int): Int =
    Math.floorMod(id * 7 + x * 19 + y * 23, 256L).toInt

  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte
    b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte
    b(i + 3) = ((v >> 24) & 0xff).toByte
  }

  def bmp(id: Long): Array[Byte] = {
    if (Math.floorMod(id, 13L) == 6L) // garbage row: not a BMP at all
      return Array.fill[Byte](16)(0xAB.toByte)
    val w = width(id)
    val h = height(id)
    val topDown = Math.floorMod(id, 5L) == 2L
    val gap = if (Math.floorMod(id, 4L) == 1L) 8 else 0
    val rowStride = ((w * 3 + 3) / 4) * 4
    val dataOffset = 54 + gap
    val size = dataOffset + rowStride * h
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, size)
    putLe32(b, 10, dataOffset)
    putLe32(b, 14, 40) // BITMAPINFOHEADER
    putLe32(b, 18, w)
    putLe32(b, 22, if (topDown) -h else h)
    b(26) = 1 // planes
    b(28) = 24 // bpp
    putLe32(b, 30, 0) // BI_RGB
    putLe32(b, 34, rowStride * h)
    var i = 54
    while (i < dataOffset) { b(i) = 0x5a; i += 1 } // gap junk
    var fileRow = 0
    while (fileRow < h) {
      val y = if (topDown) fileRow else h - 1 - fileRow
      val base = dataOffset + fileRow * rowStride
      var x = 0
      while (x < w) {
        val p = base + x * 3
        b(p) = blue(id, x, y).toByte
        b(p + 1) = green(id, x, y).toByte
        b(p + 2) = red(id, x, y).toByte
        x += 1
      }
      fileRow += 1
    }
    b
  }
}

/** `doc_id` → deterministic BMP payload bytes (see [[BmpSynthKernel]]).
  * A codegen projection like every graft kernel — the test corpus's
  * binary-media stand-in distributes with the data. */
case class SynthBmp(child: Expression)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_bmp"

  override protected def nullSafeEval(input: Any): Any =
    BmpSynthKernel.bmp(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BmpSynthKernel.bmp($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthBmp =
    copy(child = newChild)
}

/** `binary` BMP payload → the 8×8 decoded-luminance tile as
  * `array<bigint>` (64 cells, row-major; NULL for non-BMP payloads) —
  * the REAL pixel stage of the multimodal pipeline for the one format
  * that needs no codec. */
case class BmpLumaTile(child: Expression)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_tile"

  override protected def nullSafeEval(input: Any): Any =
    BmpKernel.lumaTileUnsafe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpKernel.lumaTileUnsafe($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpLumaTile =
    copy(child = newChild)
}

/** `binary` BMP payload → 64-bit perceptual hash over DECODED PIXELS
  * (NULL for non-BMP payloads) — [[PHash64]]'s real-luminance sibling:
  * same DCT, same banding downstream, but the tile is the image, not a
  * byte sample. */
case class PHashBmp(child: Expression)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phash_bmp"

  override protected def nullSafeEval(input: Any): Any = {
    val h = BmpKernel.phash(input.asInstanceOf[Array[Byte]])
    if (h == Long.MinValue) null else java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpKernel.phash($c);
      ${ev.isNull} = ${ev.value} == Long.MIN_VALUE;
    """)

  override protected def withNewChildInternal(newChild: Expression): PHashBmp =
    copy(child = newChild)
}
