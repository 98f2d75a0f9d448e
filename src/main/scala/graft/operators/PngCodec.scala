package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec for the multimodal pipeline — a REAL (bounded)
  * decoder, not a stub: signature check, CRC-verified chunk walk, IHDR
  * parse, zlib IDAT inflate (`java.util.zip` — in the JDK, no native
  * deps), and full five-filter scanline reconstruction per the PNG
  * spec (RFC 2083 §6; filters None/Sub/Up/Average/Paeth).
  *
  * Scope is the bounded-decoder contract a feature-extraction pipeline
  * wants: 8-bit greyscale (colour type 0, non-interlaced) decodes to
  * pixels; anything else fails loudly rather than half-decoding. The
  * `maxPixels` bound caps the inflate BEFORE allocation, so a
  * malformed header can't balloon an executor (decompression-bomb
  * guard — at 100 TB a corrupt payload must cost O(1), not an OOM).
  */
object PngCodec {

  /** The 8-byte PNG file signature. */
  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** A decoded greyscale image: `pixels` is row-major, one byte per
    * pixel (filter bytes already reconstructed away). */
  final case class PngImage(width: Int, height: Int, bitDepth: Int,
                            colorType: Int, pixels: Array[Byte])

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def putU32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def chunk(out: ByteArrayOutputStream, tpe: String,
                    data: Array[Byte]): Unit = {
    putU32(out, data.length.toLong)
    val tb = tpe.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(tb, 0, tb.length)
    out.write(data, 0, data.length)
    putU32(out, crc.getValue)
  }

  /** Encode an 8-bit greyscale image (colour type 0, non-interlaced,
    * filter 0 per scanline, one IDAT). `pixels` row-major, length
    * width*height. Deterministic for fixed input (Deflater default
    * settings), so synthesized test corpora are reproducible. */
  def encodeGray8(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != ${width}x$height")
    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new ByteArrayOutputStream()
    putU32(ihdr, width.toLong); putU32(ihdr, height.toLong)
    ihdr.write(8)  // bit depth
    ihdr.write(0)  // colour type: greyscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, filter0, no interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    // raw scanline stream: per row, a filter byte (0 = None) + pixels
    val raw = new Array[Byte](height * (width + 1))
    var r = 0
    while (r < height) {
      raw(r * (width + 1)) = 0
      System.arraycopy(pixels, r * width, raw, r * (width + 1) + 1, width)
      r += 1
    }
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG to greyscale pixels. Verifies the signature and
    * every chunk CRC, parses IHDR, concatenates IDAT, inflates with a
    * pre-checked size bound, and reconstructs all five scanline
    * filters. Throws IllegalArgumentException on anything outside the
    * bounded contract (wrong signature/CRC/truncation, colour type ≠
    * greyscale-8, interlaced, > maxPixels). */
  def decode(bytes: Array[Byte], maxPixels: Int = 1 << 24): PngImage = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"PNG decode: $msg")
    if (bytes.length < Signature.length + 12 ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOf(bytes, Signature.length), Signature))
      fail("bad signature")
    var off = Signature.length
    var width, height, bitDepth, colorType = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (off + 8 > bytes.length) fail("truncated chunk header")
      val len = u32(bytes, off)
      if (len > Int.MaxValue - 12 || off + 12 + len > bytes.length)
        fail("truncated chunk body")
      val tpe = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len.toInt)
      if (crc.getValue != u32(bytes, off + 8 + len.toInt))
        fail(s"CRC mismatch in $tpe")
      tpe match {
        case "IHDR" =>
          if (len != 13) fail("IHDR length")
          val d = off + 8
          width = u32(bytes, d).toInt; height = u32(bytes, d + 4).toInt
          bitDepth = bytes(d + 8) & 0xff; colorType = bytes(d + 9) & 0xff
          if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
          if (bitDepth != 8 || colorType != 0)
            fail(s"unsupported bitDepth=$bitDepth colorType=$colorType " +
              "(bounded contract: greyscale-8)")
          if ((bytes(d + 12) & 0xff) != 0) fail("interlaced unsupported")
          if (width.toLong * height > maxPixels)
            fail(s"${width}x$height exceeds maxPixels=$maxPixels")
        case "IDAT" => idat.write(bytes, off + 8, len.toInt)
        case "IEND" => done = true
        case _ => // ancillary chunk: CRC-checked above, content skipped
      }
      off += 12 + len.toInt
    }
    if (width < 0) fail("missing IHDR")
    val expected = height * (width + 1) // filter byte + row, per row
    val raw = new Array[Byte](expected)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < expected && !infl.finished()) {
      val n = infl.inflate(raw, got, expected - got)
      if (n == 0 && infl.needsInput()) fail("truncated IDAT")
      got += n
    }
    val over = !infl.finished() && infl.inflate(new Array[Byte](1)) > 0
    infl.end()
    if (got < expected) fail(s"short pixel stream: $got < $expected")
    if (over) fail("IDAT longer than dimensions imply")
    // reconstruct filters; bpp = 1 (greyscale-8)
    val px = new Array[Byte](width * height)
    var r = 0
    while (r < height) {
      val filter = raw(r * (width + 1)) & 0xff
      var c = 0
      while (c < width) {
        val x = raw(r * (width + 1) + 1 + c) & 0xff
        val a = if (c > 0) px(r * width + c - 1) & 0xff else 0   // left
        val b = if (r > 0) px((r - 1) * width + c) & 0xff else 0 // up
        val cc = if (r > 0 && c > 0) px((r - 1) * width + c - 1) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - cc
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
          case f => fail(s"bad filter $f in row $r")
        }
        px(r * width + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    PngImage(width, height, bitDepth, colorType, px)
  }
}
