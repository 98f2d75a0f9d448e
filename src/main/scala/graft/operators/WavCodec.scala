package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM WAV (RIFF/WAVE) codec for the multimodal pipeline — a REAL
  * (bounded) decoder, not a stub: RIFF signature + size check, chunk
  * walk, `fmt ` parse (PCM only), and `data` extraction with a
  * pre-allocation sample bound. Companion of [[PngCodec]]: together
  * they shrink the multimodal stub boundary to video only.
  *
  * Scope is the bounded-decoder contract a feature-extraction pipeline
  * wants: uncompressed PCM, mono, 16-bit little-endian (format code 1)
  * decodes to samples; anything else fails loudly rather than
  * half-decoding. The `maxSamples` bound caps the data-chunk
  * allocation BEFORE it happens, so a malformed header costs O(1), not
  * an executor OOM (same guard discipline as [[PngCodec.decode]]).
  *
  * Format per the RIFF/WAVE convention (Microsoft/IBM 1991 multimedia
  * programming interface spec; all multi-byte fields little-endian):
  * `RIFF <size> WAVE` then chunks, of which `fmt ` (16-byte PCM body:
  * format, channels, sample rate, byte rate, block align, bits) must
  * precede `data` (raw interleaved samples).
  */
object WavCodec {

  /** Decoded PCM audio: header fields plus the raw data-chunk bytes
    * (little-endian 16-bit samples; kept as bytes so content-level
    * features — histogram/checksum — and sample-level features both
    * read from one allocation). */
  final case class WavAudio(sampleRate: Int, bitsPerSample: Int,
                            channels: Int, data: Array[Byte]) {
    def numSamples: Int = data.length / 2
    /** Signed 16-bit sample at index i (little-endian). */
    def sample(i: Int): Int =
      ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
  }

  private def putU32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  private def putU16le(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode mono 16-bit PCM. Deterministic for fixed input (a straight
    * header + little-endian sample write, no compression), so
    * synthesized test corpora are reproducible. */
  def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    putU32le(out, 36L + dataLen) // riff body: WAVE + fmt(8+16) + data(8+n)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    putU32le(out, 16L)
    putU16le(out, 1)              // audio format: PCM
    putU16le(out, 1)              // channels: mono
    putU32le(out, sampleRate.toLong)
    putU32le(out, sampleRate.toLong * 2) // byte rate
    putU16le(out, 2)              // block align
    putU16le(out, 16)             // bits per sample
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    putU32le(out, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out.write(samples(i) & 0xff); out.write((samples(i) >> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }

  /** Decode a WAV container to PCM data. Verifies the RIFF signature
    * and declared size, walks chunks, parses `fmt `, and extracts
    * `data` with the sample bound checked BEFORE allocation. Throws
    * IllegalArgumentException on anything outside the bounded contract
    * (bad magic/truncation, non-PCM, non-mono, bits ≠ 16, odd data
    * length, > maxSamples). */
  def decode(bytes: Array[Byte], maxSamples: Int = 1 << 26): WavAudio = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"WAV decode: $msg")
    if (bytes.length < 12) fail("truncated header")
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F') fail("bad RIFF signature")
    if (u32le(bytes, 4) != bytes.length - 8L)
      fail(s"RIFF size ${u32le(bytes, 4)} != ${bytes.length - 8}")
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
        bytes(11) != 'E') fail("bad WAVE form type")
    var off = 12
    var sampleRate = -1; var bits = -1; var channels = -1
    var data: Array[Byte] = null
    while (off < bytes.length) {
      if (off + 8 > bytes.length) fail("truncated chunk header")
      val tpe = new String(bytes, off, 4, "US-ASCII")
      val len = u32le(bytes, off + 4)
      if (len > Int.MaxValue - 8 || off + 8 + len > bytes.length)
        fail(s"truncated $tpe chunk body")
      tpe match {
        case "fmt " =>
          if (len < 16) fail("fmt chunk too short")
          val d = off + 8
          val fmt = u16le(bytes, d)
          if (fmt != 1) fail(s"unsupported format code $fmt " +
            "(bounded contract: PCM)")
          channels = u16le(bytes, d + 2)
          if (channels != 1) fail(s"unsupported channels=$channels " +
            "(bounded contract: mono)")
          sampleRate = u32le(bytes, d + 4).toInt
          if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
          bits = u16le(bytes, d + 14)
          if (bits != 16) fail(s"unsupported bits=$bits " +
            "(bounded contract: 16-bit)")
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt")
          if (len % 2 != 0) fail(s"odd data length $len for 16-bit samples")
          if (len / 2 > maxSamples)
            fail(s"${len / 2} samples exceeds maxSamples=$maxSamples")
          if (data != null) fail("duplicate data chunk")
          data = java.util.Arrays.copyOfRange(
            bytes, off + 8, off + 8 + len.toInt)
        case _ => // ancillary chunk (LIST, fact, …): skipped
      }
      // chunks are word-aligned: odd-length bodies carry a pad byte
      off += 8 + len.toInt + (len % 2).toInt
    }
    if (sampleRate < 0) fail("missing fmt chunk")
    if (data == null) fail("missing data chunk")
    WavAudio(sampleRate, bits, channels, data)
  }
}
