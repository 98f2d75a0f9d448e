package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AviCodec, Multimodal, PngCodec, WavCodec}

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // doc 0 is an image with ASYMMETRIC dims: n_chars=100 → 37x5
  // (imageDims), 185 pixels cycling the 100 text bytes
  private def docs = Seq(
    (0L, "ab" * 50, 100L),
    (1L, "tiny", 4L),
    (2L, "x" * 1500, 1500L))
    .toDF("doc_id", "text", "n_chars")
    .withColumn("lang", lit("en")).withColumn("source", lit("src0"))

  test("fromDocuments: image payloads are REAL PNGs; typed metadata schema") {
    val items = Multimodal.fromDocuments(docs)
    val schema = items.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val byId = items.collect().map(m => m.media_id -> m).toMap
    assert(byId(0L).media_type == "image" && byId(1L).media_type == "audio"
      && byId(2L).media_type == "video")
    // the image payload is an actual PNG container: signature present,
    // and PngCodec round-trips it to the cycled text bytes
    val png = byId(0L).payload
    assert(png.take(8).sameElements(PngCodec.Signature))
    val img = PngCodec.decode(png)
    assert(img.width == 37 && img.height == 5 && img.bitDepth == 8)
    val tb = ("ab" * 50).getBytes("UTF-8")
    assert(img.pixels.toSeq == (0 until 185).map(i => tb(i % tb.length)))
    assert(byId(0L).meta.format == "image/png")
    assert(byId(1L).meta.sampleRateHz == 16000)
    // the audio payload is an actual RIFF/WAVE container: magic
    // present, and WavCodec round-trips it to the generation-rule
    // samples ((b - 128) * 256 per text byte)
    val wavBytes = byId(1L).payload
    assert(new String(wavBytes.take(4), "US-ASCII") == "RIFF")
    assert(byId(1L).meta.format == "audio/wav")
    val wav = WavCodec.decode(wavBytes)
    assert(wav.sampleRate == 16000 && wav.bitsPerSample == 16
      && wav.channels == 1)
    val ab = "tiny".getBytes("UTF-8")
    assert(wav.numSamples == 4)
    assert((0 until 4).map(wav.sample) ==
      ab.toSeq.map(b => ((b & 0xff) - 128) * 256))
    // the video payload is an actual RIFF/AVI container: magic present,
    // and AviCodec round-trips it to the per-frame phase-shifted text
    // bytes. n_chars=1500 → videoDims 29x13, (1500 % 6) + 2 = 2 frames
    val avi = byId(2L).payload
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    assert(byId(2L).meta.format == "video/avi")
    val vid = AviCodec.decode(avi)
    assert(vid.width == 29 && vid.height == 13 && vid.fps == 25)
    assert(vid.numFrames == 2)
    // all-'x' text → every pixel of every frame is 'x'
    assert(vid.frames.forall(_.forall(_ == 'x'.toByte)))
  }

  test("decode: image features are decoded out of the container " +
       "(format-true), histogram normalized, partition-preserving") {
    val items = Multimodal.fromDocuments(docs).repartition(3)
    val feats = Multimodal.decode(items)
    assert(feats.rdd.getNumPartitions == 3) // mapPartitions keeps partitioning
    val f = feats.collect().map(x => x.media_id -> x).toMap
    // image: every format field read back from IHDR / reconstructed
    // pixels, n_bytes is the DECODED content size (37*5), not the
    // container size
    assert(f(0L).n_bytes == 185)
    assert(f(0L).width == 37 && f(0L).height == 5)
    assert(f(0L).bit_depth == 8 && f(0L).color_type == 0)
    assert(f(0L).px_min == 'a'.toInt && f(0L).px_max == 'b'.toInt)
    // 185 = 93 'a' + 92 'b' (cycling starts and ends on 'a')
    assert(f(0L).px_mean == (93.0 * 'a' + 92.0 * 'b') / 185.0)
    // audio: format fields read back from the fmt chunk; content is
    // the extracted PCM data chunk (2 bytes per sample), amplitude
    // stats over the signed samples. "tiny" = t,i,n,y → samples
    // (116-128)*256=-3072, (105-128)*256=-5888, -4608, -1792
    assert(f(1L).n_bytes == 8 && f(1L).width == 0)
    assert(f(1L).bit_depth == 16 && f(1L).sample_rate == 16000)
    assert(f(1L).n_samples == 4)
    assert(f(1L).amp_min == -5888 && f(1L).amp_max == -1792)
    assert(f(1L).amp_mean == -3840.0)
    // video: REAL AVI decode — content is the concatenated decoded
    // frames (2 frames of 29x13 = 754 px), format fields read back
    // from avih/strh/strf, not copied from metadata
    assert(f(2L).n_bytes == 754 && f(2L).width == 29 && f(2L).height == 13)
    assert(f(2L).bit_depth == 8 && f(2L).n_frames == 2 && f(2L).fps == 25)
    assert(f(2L).px_min == 'x'.toInt && f(2L).px_max == 'x'.toInt)
    assert(f(2L).sample_rate == 0 && f(2L).n_samples == 0)
    // non-video rows carry no frame fields
    assert(f(0L).n_frames == 0 && f(1L).n_frames == 0 && f(0L).fps == 0)
    assert(f.values.forall(_.histogram.length == Multimodal.HistogramBins))
    assert(f.values.forall(x => math.abs(x.histogram.sum - 1.0) < 1e-9))
    // deterministic: same input -> same checksum
    val again = Multimodal.decode(Multimodal.fromDocuments(docs))
      .collect().map(x => x.media_id -> x.checksum).toMap
    assert(f.view.mapValues(_.checksum).toMap == again)
  }

  test("frameSample: chunk count, offsets, strided sampling") {
    val items = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(items, frameSize = 256, every = 4)
      .collect().groupBy(_.media_id)
    // doc 2 (video, AVI container): windows derive from the container
    // size — every 4th 256-byte window, short tail preserved
    val vlen = items.filter(_.media_id == 2L).head().payload.length
    val nWin = (vlen + 255) / 256
    assert(frames(2L).map(_.frame_no).sorted.toSeq ==
      (0 until nWin by 4).toSeq)
    assert(frames(2L).find(_.frame_no == 4).get.offset == 1024)
    // doc 1 (audio, 44-byte WAV header + 8 data bytes = 52-byte
    // container): 1 frame, short tail preserved
    assert(frames(1L).head.frame_bytes.length == 52)
  }

  test("videoFrameStats: real per-frame demux with per-frame stats") {
    // doc 5 is video (5 % 3 == 2): n_chars=4 → 5x5 canvas, 6 frames;
    // frame f's pixels cycle "abcd" with phase shift f
    val vdocs = Seq((5L, "abcd", 4L)).toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
    val stats = Multimodal.videoFrameStats(Multimodal.fromDocuments(vdocs))
      .collect().sortBy(_.frame_no)
    assert(stats.map(_.frame_no).toSeq == (0 until 6))
    val tb = "abcd".getBytes("UTF-8").map(_ & 0xff)
    stats.foreach { s =>
      assert(s.f_bytes == 25 && s.f_min == 'a'.toInt && s.f_max == 'd'.toInt)
      // 25 px = 6 full abcd cycles + 1 extra byte at phase (24+f)%4
      val expSum = 6 * tb.sum + tb(s.frame_no % 4)
      assert(s.f_mean == expSum.toDouble / 25)
    }
    // the phase shift makes frames genuinely differ (period 4: frames
    // 0..3 distinct, 4 and 5 repeat 0 and 1)
    assert(stats.map(_.f_checksum).distinct.length == 4)
  }

  test("resize: real pixel pooling, valid re-encoded PNG, aspect kept, " +
       "non-images untouched") {
    val items = Multimodal.fromDocuments(docs)
    val orig = items.filter($"media_id" === 0L).head()
    val resized = Multimodal.resize(items, maxDim = 20)
      .collect().map(m => m.media_id -> m).toMap
    val img = resized(0L) // image, 37x5
    assert(math.max(img.meta.width, img.meta.height) == 20)
    assert(img.meta.width > img.meta.height) // aspect preserved
    // the payload is a REAL re-encoded PNG whose pixels are the exact
    // integer box-pool of the original decoded pixels
    val out = PngCodec.decode(img.payload)
    assert((out.width, out.height) == (img.meta.width, img.meta.height))
    val in = PngCodec.decode(orig.payload)
    val (w, h, nw, nh) = (in.width, in.height, out.width, out.height)
    for (oy <- 0 until nh; ox <- 0 until nw) {
      val (y0, y1) = (oy * h / nh, (oy + 1) * h / nh)
      val (x0, x1) = (ox * w / nw, (ox + 1) * w / nw)
      val box = for (y <- y0 until y1; x <- x0 until x1)
        yield (in.pixels(y * w + x) & 0xff).toLong
      assert((out.pixels(oy * nw + ox) & 0xff) == box.sum / box.size,
        s"pixel ($ox,$oy)")
    }
    assert(resized(1L).meta == Multimodal.fromDocuments(docs)
      .filter($"media_id" === 1L).head().meta)
  }

  // ---- PngCodec unit coverage (no Spark involved) --------------------

  test("PngCodec: encode/decode round trip on deterministic noise") {
    var seed = 7L
    def nextByte(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toByte
    }
    for ((w, h) <- Seq((1, 1), (5, 3), (64, 48), (257, 2))) {
      val px = Array.fill(w * h)(nextByte())
      val img = PngCodec.decode(PngCodec.encodeGray8(w, h, px))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(px), s"round trip failed at ${w}x$h")
    }
  }

  /** Test-side PNG writer that FILTERS each scanline (row r uses
    * filter r % 5) so decode's five reconstruction paths are all
    * exercised — the library encoder only emits filter 0. */
  private def encodeFiltered(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    def u32(out: ByteArrayOutputStream, v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def chunk(out: ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
      u32(out, data.length.toLong)
      val tb = tpe.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); u32(out, crc.getValue)
    }
    val raw = new Array[Byte](h * (w + 1))
    for (r <- 0 until h) {
      val filter = r % 5
      raw(r * (w + 1)) = filter.toByte
      for (c <- 0 until w) {
        val x = px(r * w + c) & 0xff
        val a = if (c > 0) px(r * w + c - 1) & 0xff else 0
        val b = if (r > 0) px((r - 1) * w + c) & 0xff else 0
        val cc = if (r > 0 && c > 0) px((r - 1) * w + c - 1) & 0xff else 0
        val f = filter match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val p = a + b - cc
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
        }
        raw(r * (w + 1) + 1 + c) = (f & 0xff).toByte
      }
    }
    val defl = new Deflater(); defl.setInput(raw); defl.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(PngCodec.Signature)
    val ihdr = new ByteArrayOutputStream()
    u32(ihdr, w.toLong); u32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("PngCodec: all five scanline filters reconstruct exactly") {
    var seed = 99L
    def nextByte(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toByte
    }
    val (w, h) = (23, 10) // 10 rows -> every filter twice
    val px = Array.fill(w * h)(nextByte())
    val img = PngCodec.decode(encodeFiltered(w, h, px))
    assert(img.pixels.sameElements(px),
      "filtered scanlines did not reconstruct to the original pixels")
  }

  test("PngCodec: corrupt and out-of-contract inputs fail loudly") {
    val good = PngCodec.encodeGray8(4, 3, Array.fill(12)(42.toByte))
    def expectFail(bytes: Array[Byte], msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](PngCodec.decode(bytes))
      assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
    }
    expectFail(Array.fill(30)(0.toByte), "bad signature")
    expectFail(good.dropRight(5), "truncated")
    val flipped = good.clone()
    flipped(20) = (flipped(20) ^ 0x01).toByte // inside IHDR data
    expectFail(flipped, "CRC mismatch")
    // oversized: dims exceeding the pre-allocation bound
    val big = PngCodec.encodeGray8(100, 100, new Array[Byte](10000))
    val e = intercept[IllegalArgumentException](
      PngCodec.decode(big, maxPixels = 64))
    assert(e.getMessage.contains("maxPixels"))
  }

  // ---- WavCodec unit coverage (no Spark involved) --------------------

  test("WavCodec: encode/decode round trip on deterministic noise") {
    var seed = 13L
    def nextShort(): Short = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toShort
    }
    for (n <- Seq(0, 1, 7, 1000)) {
      val samples = Array.fill(n)(nextShort())
      val wav = WavCodec.decode(WavCodec.encodePcm16(16000, samples))
      assert(wav.sampleRate == 16000 && wav.bitsPerSample == 16)
      assert(wav.numSamples == n)
      assert((0 until n).forall(i => wav.sample(i) == samples(i).toInt),
        s"round trip failed at n=$n")
    }
  }

  test("WavCodec: ancillary chunks (incl. odd-length pad) are skipped") {
    // hand-build RIFF with a LIST chunk of odd length between fmt and
    // data — chunk bodies are word-aligned, so decode must skip the
    // pad byte to land on the data chunk header
    val base = WavCodec.encodePcm16(8000, Array[Short](100, -200))
    val fmtChunk = base.slice(12, 12 + 8 + 16)
    val dataChunk = base.drop(12 + 8 + 16)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'a', 'b', 'c', 0)
    val body = fmtChunk ++ list ++ dataChunk
    val out = new ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    val sz = body.length + 4
    out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
    out.write((sz >> 16) & 0xff); out.write((sz >> 24) & 0xff)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write(body)
    val wav = WavCodec.decode(out.toByteArray)
    assert(wav.sampleRate == 8000 && wav.numSamples == 2)
    assert(wav.sample(0) == 100 && wav.sample(1) == -200)
  }

  test("WavCodec: corrupt and out-of-contract inputs fail loudly") {
    val good = WavCodec.encodePcm16(16000, Array[Short](1, 2, 3, 4))
    def expectFail(bytes: Array[Byte], msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](WavCodec.decode(bytes))
      assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
    }
    expectFail(Array.fill(30)(0.toByte), "bad RIFF signature")
    expectFail(good.dropRight(3), "RIFF size") // declared size now wrong
    val badForm = good.clone(); badForm(8) = 'X'.toByte
    expectFail(badForm, "bad WAVE form type")
    val nonPcm = good.clone(); nonPcm(20) = 2 // format code 2 (ADPCM)
    expectFail(nonPcm, "format code")
    val stereo = good.clone(); stereo(22) = 2
    expectFail(stereo, "channels")
    val eightBit = good.clone(); eightBit(34) = 8
    expectFail(eightBit, "bits=8")
    // data chunk len declared odd (7, with 8 payload bytes present):
    // len field at offset 40 in the canonical 44-byte layout
    val odd = good.clone(); odd(40) = 7
    expectFail(odd, "odd data length")
    // oversized: sample count exceeding the pre-allocation bound
    val big = WavCodec.encodePcm16(16000, new Array[Short](1000))
    val e = intercept[IllegalArgumentException](
      WavCodec.decode(big, maxSamples = 64))
    assert(e.getMessage.contains("maxSamples"))
  }

  // ---- AviCodec unit coverage (no Spark involved) --------------------

  test("AviCodec: encode/decode round trip on deterministic noise") {
    var seed = 21L
    def nextByte(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toByte
    }
    // widths 1/5/29 exercise the stride padding (stride 4/8/32);
    // width 32 is the no-pad case; nf=0 is a headers-only container
    for ((w, h, nf) <- Seq((1, 1, 1), (5, 3, 4), (29, 13, 2),
                           (32, 8, 3), (7, 2, 0))) {
      val frames = Seq.fill(nf)(Array.fill(w * h)(nextByte()))
      val vid = AviCodec.decode(AviCodec.encodeGray8(w, h, 25, frames))
      assert(vid.width == w && vid.height == h && vid.fps == 25)
      assert(vid.numFrames == nf, s"frame count at ${w}x$h")
      frames.zipWithIndex.foreach { case (px, i) =>
        assert(vid.frames(i).sameElements(px),
          s"round trip failed at ${w}x$h frame $i")
      }
    }
  }

  test("AviCodec: corrupt and out-of-contract inputs fail loudly") {
    val good = AviCodec.encodeGray8(5, 3, 25, Seq(Array.fill(15)(7.toByte)))
    def expectFail(bytes: Array[Byte], msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](AviCodec.decode(bytes))
      assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
    }
    // locate a fourCC in the container (offsets are layout-derived,
    // not hardcoded)
    def idx(b: Array[Byte], s: String): Int = {
      val pat = s.getBytes("US-ASCII")
      val i = b.indices.indexWhere(i => i + 4 <= b.length &&
        pat.indices.forall(j => b(i + j) == pat(j)))
      assert(i >= 0, s"fourCC $s not found"); i
    }
    expectFail(Array.fill(30)(0.toByte), "bad RIFF signature")
    expectFail(good.dropRight(3), "RIFF size")
    val badForm = good.clone(); badForm(8) = 'X'.toByte
    expectFail(badForm, "bad AVI form")
    val comp = good.clone(); comp(idx(comp, "strf") + 8 + 16) = 1
    expectFail(comp, "biCompression")
    val bits = good.clone(); bits(idx(bits, "strf") + 8 + 14) = 24
    expectFail(bits, "biBitCount")
    val dc = good.clone(); dc(idx(dc, "00db") + 3) = 'c'.toByte
    expectFail(dc, "compressed")
    // header declares 2 frames, container carries 1
    val fewer = good.clone(); fewer(idx(fewer, "avih") + 8 + 16) = 2
    expectFail(fewer, "declared")
    // oversized: dims exceeding the pre-allocation bound
    val e = intercept[IllegalArgumentException](
      AviCodec.decode(good, maxPixelsPerFrame = 8))
    assert(e.getMessage.contains("maxPixelsPerFrame"))
  }

  test("downsampleAudio: 2:1 window average in byte domain, trailing " +
       "sample alone, valid re-encoded WAV") {
    val items = Multimodal.fromDocuments(docs)
    val orig = items.filter($"media_id" === 1L).head() // audio
    val down = Multimodal.downsampleAudio(items, factor = 2)
      .collect().map(m => m.media_id -> m).toMap
    val wavIn = WavCodec.decode(orig.payload)
    val wavOut = WavCodec.decode(down(1L).payload)
    assert(wavOut.sampleRate == wavIn.sampleRate / 2)
    assert(wavOut.numSamples == (wavIn.numSamples + 1) / 2)
    for (g <- 0 until wavOut.numSamples) {
      val bytes = (g * 2 until math.min(wavIn.numSamples, g * 2 + 2))
        .map(i => wavIn.sample(i) / 256 + 128)
      val want = (bytes.sum / bytes.size - 128) * 256
      assert(wavOut.sample(g) == want, s"sample $g")
    }
    // non-audio untouched
    assert(down(0L).payload.sameElements(
      items.filter($"media_id" === 0L).head().payload))
  }

}
