package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM AVI (RIFF/AVI) codec for the multimodal pipeline — a REAL
  * (bounded) video decoder, not a stub: RIFF signature + size check,
  * nested LIST walk (`hdrl` → `avih`/`strl`/`strh`/`strf`, then
  * `movi`), BITMAPINFOHEADER parse, and per-frame DIB reconstruction
  * (bottom-up padded scanlines back to top-down tight pixels — the
  * DIB analogue of PNG's filter pass). Completes the codec family
  * started by [[PngCodec]] (images) and [[WavCodec]] (audio): with
  * this, the multimodal stub boundary is CLOSED — all three media
  * types decode their payloads for real.
  *
  * Scope is the bounded-decoder contract a feature-extraction pipeline
  * wants: uncompressed 8-bit (`DIB `/BI_RGB, one `vids` stream)
  * decodes to frames; anything else fails loudly rather than
  * half-decoding. The `maxPixelsPerFrame`/`maxFrames` bounds cap every
  * allocation BEFORE it happens, so a malformed header costs O(1), not
  * an executor OOM (same guard discipline as [[PngCodec.decode]] and
  * [[WavCodec.decode]]).
  *
  * Format per the RIFF/AVI convention (Microsoft Video for Windows
  * 1992, OpenDML AVI file-format extensions; all multi-byte fields
  * little-endian):
  * {{{
  * RIFF <size> 'AVI '
  *   LIST <size> 'hdrl'
  *     'avih' <56>  main header (µs/frame, total frames, streams, w, h)
  *     LIST <size> 'strl'
  *       'strh' <56>   stream header ('vids'/'DIB ', scale/rate, length)
  *       'strf' <1064> BITMAPINFOHEADER (8-bit, BI_RGB) + 256-entry
  *                     greyscale palette
  *   LIST <size> 'movi'
  *     '00db' <stride*h> uncompressed DIB frame (bottom-up, each row
  *                       padded to a 4-byte boundary), repeated
  * }}}
  */
object AviCodec {

  /** Decoded video: header fields plus per-frame TOP-DOWN tight pixel
    * arrays (one byte per pixel, row-major — the padded bottom-up DIB
    * layout is undone by the decoder, so `frames(f)(r * width + c)` is
    * frame f's pixel at row r, column c). */
  final case class AviVideo(width: Int, height: Int, fps: Int,
                            frames: Array[Array[Byte]]) {
    def numFrames: Int = frames.length
  }

  /** DIB scanline stride: rows pad to a 4-byte boundary. */
  def stride(width: Int): Int = (width + 3) & ~3

  private def putU32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  private def putU16le(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def putFourCC(out: ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4); s.foreach(c => out.write(c & 0xff))
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode top-down tight 8-bit greyscale frames as an uncompressed
    * AVI. Deterministic for fixed input (fixed headers, fixed
    * greyscale palette, no compression), so synthesized test corpora
    * are reproducible. Every frame must be exactly `width * height`
    * bytes. */
  def encodeGray8(width: Int, height: Int, fps: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(fps > 0, s"bad fps $fps")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == width * height,
        s"frame $i has ${f.length} pixels, want ${width * height}")
    }
    val st = stride(width)
    val frameBytes = st * height
    // strf body: 40-byte BITMAPINFOHEADER + 256 RGBQUAD palette entries
    val strfLen = 40 + 256 * 4
    // hdrl body: avih(8+56) + LIST strl(8+4 + strh(8+56) + strf(8+strfLen))
    val strlLen = 4 + 8 + 56 + 8 + strfLen
    val hdrlLen = 4 + 8 + 56 + 8 + strlLen
    // movi body: listType + n frame chunks (stride*h is 4-aligned: no pad)
    val moviLen = 4 + frames.length * (8 + frameBytes)
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
    val out = new ByteArrayOutputStream(8 + riffLen)
    putFourCC(out, "RIFF"); putU32le(out, riffLen.toLong)
    putFourCC(out, "AVI ")
    putFourCC(out, "LIST"); putU32le(out, hdrlLen.toLong)
    putFourCC(out, "hdrl")
    putFourCC(out, "avih"); putU32le(out, 56L)
    putU32le(out, 1000000L / fps)        // dwMicroSecPerFrame
    putU32le(out, fps.toLong * frameBytes) // dwMaxBytesPerSec
    putU32le(out, 0L)                    // dwPaddingGranularity
    putU32le(out, 0L)                    // dwFlags
    putU32le(out, frames.length.toLong)  // dwTotalFrames
    putU32le(out, 0L)                    // dwInitialFrames
    putU32le(out, 1L)                    // dwStreams
    putU32le(out, frameBytes.toLong)     // dwSuggestedBufferSize
    putU32le(out, width.toLong)          // dwWidth
    putU32le(out, height.toLong)         // dwHeight
    putU32le(out, 0L); putU32le(out, 0L) // dwReserved[4]
    putU32le(out, 0L); putU32le(out, 0L)
    putFourCC(out, "LIST"); putU32le(out, strlLen.toLong)
    putFourCC(out, "strl")
    putFourCC(out, "strh"); putU32le(out, 56L)
    putFourCC(out, "vids")               // fccType
    putFourCC(out, "DIB ")               // fccHandler: uncompressed
    putU32le(out, 0L)                    // dwFlags
    putU16le(out, 0); putU16le(out, 0)   // wPriority, wLanguage
    putU32le(out, 0L)                    // dwInitialFrames
    putU32le(out, 1L)                    // dwScale
    putU32le(out, fps.toLong)            // dwRate (fps = rate/scale)
    putU32le(out, 0L)                    // dwStart
    putU32le(out, frames.length.toLong)  // dwLength (in frames)
    putU32le(out, frameBytes.toLong)     // dwSuggestedBufferSize
    putU32le(out, 0L)                    // dwQuality
    putU32le(out, 0L)                    // dwSampleSize
    putU16le(out, 0); putU16le(out, 0)   // rcFrame: left, top
    putU16le(out, width); putU16le(out, height)
    putFourCC(out, "strf"); putU32le(out, strfLen.toLong)
    putU32le(out, 40L)                   // biSize
    putU32le(out, width.toLong)          // biWidth
    putU32le(out, height.toLong)         // biHeight (positive: bottom-up)
    putU16le(out, 1)                     // biPlanes
    putU16le(out, 8)                     // biBitCount
    putU32le(out, 0L)                    // biCompression = BI_RGB
    putU32le(out, frameBytes.toLong)     // biSizeImage
    putU32le(out, 0L); putU32le(out, 0L) // biXPelsPerMeter, biYPels
    putU32le(out, 256L)                  // biClrUsed
    putU32le(out, 0L)                    // biClrImportant
    var p = 0
    while (p < 256) { // greyscale palette: RGBQUAD = (blue, green, red, 0)
      out.write(p); out.write(p); out.write(p); out.write(0)
      p += 1
    }
    putFourCC(out, "LIST"); putU32le(out, moviLen.toLong)
    putFourCC(out, "movi")
    frames.foreach { px =>
      putFourCC(out, "00db"); putU32le(out, frameBytes.toLong)
      var r = height - 1 // DIB rows are bottom-up
      while (r >= 0) {
        out.write(px, r * width, width)
        var pad = st - width
        while (pad > 0) { out.write(0); pad -= 1 }
        r -= 1
      }
    }
    out.toByteArray
  }

  /** Decode an AVI container to top-down tight frames. Verifies the
    * RIFF signature and declared size, walks `hdrl` (main + stream
    * headers, BITMAPINFOHEADER) and `movi` (frame chunks), and
    * reconstructs each frame from its padded bottom-up DIB layout —
    * with every allocation bounded BEFORE it happens. Throws
    * IllegalArgumentException on anything outside the bounded contract
    * (bad magic/truncation, non-`vids`/non-`DIB ` stream, bit depth ≠
    * 8, compressed frames, dims/frame-count over the caps, frame chunk
    * size ≠ stride*height, frame count ≠ header's dwTotalFrames). */
  def decode(bytes: Array[Byte], maxPixelsPerFrame: Int = 1 << 24,
             maxFrames: Int = 1 << 16): AviVideo = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"AVI decode: $msg")
    if (bytes.length < 12) fail("truncated header")
    if (fourCC(bytes, 0) != "RIFF") fail("bad RIFF signature")
    if (u32le(bytes, 4) != bytes.length - 8L)
      fail(s"RIFF size ${u32le(bytes, 4)} != ${bytes.length - 8}")
    if (fourCC(bytes, 8) != "AVI ") fail("bad AVI form type")
    var width = -1; var height = -1; var fps = -1
    var totalFrames = -1L
    var sawStrh = false; var sawStrf = false
    var frames: Array[Array[Byte]] = null
    var frameCount = 0

    // one nested chunk walk; LIST bodies recurse (hdrl/strl/movi are
    // the only list types with content we read — others are skipped)
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off < end) {
        if (off + 8 > end) fail("truncated chunk header")
        val tpe = fourCC(bytes, off)
        val len = u32le(bytes, off + 4)
        if (len > Int.MaxValue - 8 || off + 8 + len > end)
          fail(s"truncated $tpe chunk body")
        val body = off + 8
        val blen = len.toInt
        tpe match {
          case "LIST" =>
            if (blen < 4) fail("LIST chunk too short")
            val listType = fourCC(bytes, body)
            if (listType == "hdrl" || listType == "strl" ||
                listType == "movi")
              walk(body + 4, body + blen, inMovi = listType == "movi")
          case "avih" =>
            if (blen < 56) fail("avih chunk too short")
            val usPerFrame = u32le(bytes, body)
            totalFrames = u32le(bytes, body + 16)
            width = u32le(bytes, body + 32).toInt
            height = u32le(bytes, body + 36).toInt
            if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
            if (width.toLong * height > maxPixelsPerFrame)
              fail(s"${width}x$height exceeds maxPixelsPerFrame=" +
                s"$maxPixelsPerFrame")
            if (totalFrames > maxFrames)
              fail(s"$totalFrames frames exceeds maxFrames=$maxFrames")
            if (usPerFrame <= 0) fail(s"bad µs/frame $usPerFrame")
            // bound the total decoded size, not just each factor
            if (totalFrames * width * height > maxFrames.toLong *
                maxPixelsPerFrame) fail("decoded size over bound")
          case "strh" =>
            if (blen < 56) fail("strh chunk too short")
            if (sawStrh) fail("multiple streams (bounded contract: one)")
            sawStrh = true
            val fccType = fourCC(bytes, body)
            if (fccType != "vids") fail(s"unsupported stream '$fccType' " +
              "(bounded contract: vids)")
            val handler = fourCC(bytes, body + 4)
            if (handler != "DIB " && u32le(bytes, body + 4) != 0L)
              fail(s"unsupported handler '$handler' " +
                "(bounded contract: uncompressed DIB)")
            val scale = u32le(bytes, body + 20)
            val rate = u32le(bytes, body + 24)
            if (scale <= 0 || rate <= 0 || rate % scale != 0)
              fail(s"bad rate/scale $rate/$scale")
            fps = (rate / scale).toInt
          case "strf" =>
            if (!sawStrh) fail("strf before strh")
            if (blen < 40) fail("strf chunk too short")
            sawStrf = true
            if (u32le(bytes, body) < 40L) fail("bad biSize")
            val bw = u32le(bytes, body + 4).toInt
            val bh = u32le(bytes, body + 8).toInt
            if (bw != width || bh != height)
              fail(s"strf dims ${bw}x$bh != avih ${width}x$height")
            val bits = u16le(bytes, body + 14)
            if (bits != 8) fail(s"unsupported biBitCount=$bits " +
              "(bounded contract: 8-bit)")
            if (u32le(bytes, body + 16) != 0L)
              fail("unsupported biCompression (bounded contract: BI_RGB)")
          case "00db" if inMovi =>
            if (width < 0 || !sawStrf) fail("frame chunk before headers")
            if (frames == null) {
              if (totalFrames < 0) fail("frame chunk before avih")
              frames = new Array[Array[Byte]](totalFrames.toInt)
            }
            val st = stride(width)
            if (blen != st * height)
              fail(s"frame chunk $blen bytes, want ${st * height}")
            if (frameCount >= frames.length)
              fail(s"more frame chunks than dwTotalFrames=$totalFrames")
            val px = new Array[Byte](width * height)
            var r = 0
            while (r < height) { // undo bottom-up + stride padding
              System.arraycopy(bytes, body + (height - 1 - r) * st,
                px, r * width, width)
              r += 1
            }
            frames(frameCount) = px
            frameCount += 1
          case "00dc" if inMovi =>
            fail("compressed frame chunk (bounded contract: 00db)")
          case _ => // ancillary chunk (idx1, JUNK, …): skipped
        }
        off += 8 + blen + (blen & 1) // chunks are word-aligned
      }
    }

    walk(12, bytes.length, inMovi = false)
    if (width < 0) fail("missing avih chunk")
    if (!sawStrh || !sawStrf) fail("missing stream headers")
    if (frames == null && totalFrames != 0L) fail("missing movi frames")
    if (frames != null && frameCount != frames.length)
      fail(s"found $frameCount frames, header declared ${frames.length}")
    AviVideo(width, height, fps,
      if (frames == null) Array.empty[Array[Byte]] else frames)
  }
}
