package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Media
import graft.operators.Media.{MediaFeatures, MediaRow}

/** Multimodal plumbing tests: binary columns, metadata, the decode stub's
  * partition-parallel path, frame sampling, resize metadata.
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def rows: Seq[MediaRow] = Seq(
    MediaRow(1L, "image", Array[Byte](0x42, 0x4d, 1, 2, 3, 4), "image/bmp", 640, 480, 0L),
    MediaRow(2L, "audio", Array.tabulate[Byte](256)(i => i.toByte), "audio/wav", 0, 0, 2500L),
    MediaRow(3L, "video", Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70), "video/mp4", 1920, 1080, 10000L))

  test("mediaMeta: size, sha, and magic bytes from the binary column") {
    val meta = Media.mediaMeta(rows.toDF()).collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[Long]("size_bytes") === 6L)
    assert(meta(1L).getAs[String]("magic_hex") === "424D0102") // BM..
    assert(meta(3L).getAs[String]("magic_hex") === "00000018")
    assert(meta(2L).getAs[String]("content_sha").length === 64)
  }

  test("decodeStub: deterministic fixed-width features, L1-normalized") {
    val feats = Media.decodeStub(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    assert(feats.size === 3)
    feats.values.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9, "histogram must be L1-normalized")
    }
    // the 256-byte ramp hits every nibble bucket equally: 16/256 each
    assert(feats(2L).feature.forall(v => math.abs(v - 1.0 / 16) < 1e-12))
    // determinism
    val again = Media.decodeStub(rows.toDS()).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again === feats.view.mapValues(_.feature.toSeq).toMap)
  }

  // ---------------------------------------------------------------------
  // Real decoders (BMP 24bpp / WAV PCM16) — golden-value tests against
  // files assembled byte-by-byte per the public format specs.
  // ---------------------------------------------------------------------

  /** Minimal 24bpp BI_RGB BMP encoder: pixels are row-major TOP-DOWN
    * 0xRRGGBB; written bottom-up with 4-byte row padding, as the format
    * requires — so the decoder's row-flip and padding logic is exercised.
    */
  def bmpBytes(w: Int, h: Int, px: Seq[Int]): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def put16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'.toByte; b(1) = 'M'.toByte; put32(2, size); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h); put16(26, 1); put16(28, 24); put32(30, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      val base = 54 + (h - 1 - y) * rowBytes + x * 3 // bottom-up
      b(base) = (p & 0xff).toByte          // B
      b(base + 1) = ((p >> 8) & 0xff).toByte // G
      b(base + 2) = ((p >> 16) & 0xff).toByte // R
    }
    b
  }

  /** Minimal 16-bit PCM WAV encoder with a LIST chunk before data, so the
    * decoder's chunk walk is exercised.
    */
  def wavBytes(rate: Int, channels: Int, samples: Seq[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val listSize = 4 // "INFO"
    val size = 12 + (8 + 16) + (8 + listSize) + (8 + dataSize)
    val b = new Array[Byte](size)
    def putS(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(b, i)
    def put16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    putS(0, "RIFF"); put32(4, size - 8); putS(8, "WAVE")
    putS(12, "fmt "); put32(16, 16)
    put16(20, 1); put16(22, channels); put32(24, rate)
    put32(28, rate * channels * 2); put16(32, channels * 2); put16(34, 16)
    putS(36, "LIST"); put32(40, listSize); putS(44, "INFO")
    putS(48, "data"); put32(52, dataSize)
    samples.zipWithIndex.foreach { case (s, i) => put16(56 + 2 * i, s & 0xffff) }
    b
  }

  test("decodeBmpPixels: 4x4 golden pixels round-trip, bottom-up + padding") {
    // 3 wide (9 pixel bytes -> padded to 12) x 2 tall checks padding; then 4x4 golden
    val small = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030, 0x405060, 0x708090)
    val Some((w2, h2, px2)) = Media.decodeBmpPixels(bmpBytes(3, 2, small))
    assert((w2, h2) === (3, 2))
    assert(px2.toSeq === small)

    val golden = (0 until 16).map(i => (i * 17 << 16) | (255 - i * 17 << 8) | (i * 8))
    val Some((w, h, px)) = Media.decodeBmpPixels(bmpBytes(4, 4, golden))
    assert((w, h) === (4, 4))
    assert(px.toSeq === golden)
  }

  test("decodeBmpPixels: rejects malformed and unsupported payloads") {
    assert(Media.decodeBmpPixels(Array[Byte](0x42, 0x4d, 1, 2)) === None) // truncated
    assert(Media.decodeBmpPixels(wavBytes(8000, 1, Seq(1, 2))) === None) // not a BMP
    val bad = bmpBytes(2, 2, Seq(0, 0, 0, 0)); bad(28) = 8 // 8bpp unsupported
    assert(Media.decodeBmpPixels(bad) === None)
  }

  test("hostile headers with overflowing sizes return None, never crash") {
    // BMP declaring w=715827883: w*3+3 wraps negative in 32-bit math
    val bmp = bmpBytes(2, 2, Seq(0, 0, 0, 0))
    def put32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    val wideBmp = bmp.clone(); put32(wideBmp, 18, 715827883)
    assert(Media.decodeBmpPixels(wideBmp) === None)
    val hugeBmp = bmp.clone(); put32(hugeBmp, 18, Int.MaxValue); put32(hugeBmp, 22, 1)
    assert(Media.decodeBmpPixels(hugeBmp) === None)
    val minHBmp = bmp.clone(); put32(minHBmp, 22, Int.MinValue) // abs() would overflow
    assert(Media.decodeBmpPixels(minHBmp) === None)
    // WAV declaring a chunk size near Int.MaxValue: dataStart+size wraps
    val wav = wavBytes(8000, 1, Seq[Short](1, 2, 3))
    put32(wav, 40, 0x7ffffff0) // LIST chunk size
    assert(Media.decodeWavPcm(wav) === None)
    val wavData = wavBytes(8000, 1, Seq[Short](1, 2, 3))
    put32(wavData, 52, 0x7ffffff0) // data chunk size
    assert(Media.decodeWavPcm(wavData) === None)
  }

  // ---------------------------------------------------------------------
  // PNG decoder — golden pixels through a byte-assembled encoder that
  // exercises every scanline filter (None/Sub/Up/Average/Paeth), the
  // chunk walk (ancillary chunks, split IDAT), DEFLATE, and the color
  // types the decoder supports.
  // ---------------------------------------------------------------------

  /** Minimal PNG encoder: 8-bit depth, chosen color type, one chosen
    * filter byte per scanline (the filter transform is applied here so the
    * decoder must invert it), deflated into IDAT chunks of `idatSplit`
    * bytes, with an ancillary tEXt chunk before the image data.
    */
  def pngBytes(
      w: Int, h: Int, colorType: Int, pxBytes: Seq[Seq[Int]],
      filters: Seq[Int], idatSplit: Int = Int.MaxValue): Array[Byte] = {
    val bpp = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    val raw = new java.io.ByteArrayOutputStream()
    val prevRow = new Array[Int](w * bpp)
    for (y <- 0 until h) {
      val cur = pxBytes(y)
      require(cur.length == w * bpp)
      val f = filters(y)
      raw.write(f)
      for (i <- 0 until w * bpp) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = if (y > 0) prevRow(i) else 0
        val c = if (y > 0 && i >= bpp) pxBytes(y - 1)(i - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw.write((cur(i) - pred) & 0xff)
      }
      cur.copyToArray(prevRow)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def be32b(v: Int) = ihdr.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
    be32b(w); be32b(h); ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("tEXt", "Comment golden".getBytes("US-ASCII")) // ancillary, must be skipped
    zipped.toByteArray.grouped(idatSplit).foreach(part => chunk("IDAT", part))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("decodePngPixels: RGB golden pixels through every filter type, split IDAT") {
    // 3x5 RGB image: each row uses a different filter (0..4)
    val px = (0 until 15).map(i => ((i * 16) % 256 << 16) | ((255 - i * 10) << 8) | (i * 7) % 256)
    val rows = (0 until 5).map(y => (0 until 3).flatMap { x =>
      val p = px(y * 3 + x); Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    })
    val bytes = pngBytes(3, 5, 2, rows, filters = Seq(0, 1, 2, 3, 4), idatSplit = 7)
    val Some((w, h, got)) = Media.decodePngPixels(bytes)
    assert((w, h) === (3, 5))
    assert(got.toSeq === px)
  }

  test("decodePngPixels: RGBA drops alpha, grayscale replicates") {
    val rgba = Seq(Seq(10, 20, 30, 255, 200, 100, 50, 0)) // 2x1 RGBA
    val Some((_, _, pxA)) = Media.decodePngPixels(pngBytes(2, 1, 6, rgba, Seq(1)))
    assert(pxA.toSeq === Seq(0x0a141e, 0xc86432))
    val gray = Seq(Seq(0, 128), Seq(255, 7)) // 2x2 gray, Up-filtered second row
    val Some((_, _, pxG)) = Media.decodePngPixels(pngBytes(2, 2, 0, gray, Seq(0, 2)))
    assert(pxG.toSeq === Seq(0x000000, 0x808080, 0xffffff, 0x070707))
  }

  test("decodePngPixels: rejects unsupported, truncated, and hostile payloads") {
    val ok = pngBytes(2, 2, 2, Seq(Seq(1, 2, 3, 4, 5, 6), Seq(7, 8, 9, 10, 11, 12)), Seq(0, 0))
    assert(Media.decodePngPixels(ok).isDefined)
    // palette color type
    val pal = ok.clone(); pal(8 + 8 + 9) = 3
    assert(Media.decodePngPixels(pal) === None)
    // interlaced
    val adam7 = ok.clone(); adam7(8 + 8 + 12) = 1
    assert(Media.decodePngPixels(adam7) === None)
    // truncated DEFLATE stream
    assert(Media.decodePngPixels(ok.dropRight(20)) === None)
    // hostile dimensions: raw size would exceed the allocation cap
    def be32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >> 24).toByte; b(i + 1) = (v >> 16).toByte
      b(i + 2) = (v >> 8).toByte; b(i + 3) = v.toByte
    }
    val huge = ok.clone(); be32(huge, 16, 0x7fffffff); be32(huge, 20, 0x7fffffff)
    assert(Media.decodePngPixels(huge) === None)
    // not a PNG at all
    assert(Media.decodePngPixels(bmpBytes(2, 2, Seq(0, 0, 0, 0))) === None)
    // preset-dictionary zlib header (0x78BB: valid checksum, FDICT set —
    // never legal in PNG): inflate() yields no progress forever, so the
    // decoder must fail fast instead of spinning
    val fdict = ok.clone()
    val idatData = 8 + (8 + 13 + 4) + (8 + 14 + 4) + 8 // sig+IHDR+tEXt+IDAT hdr
    fdict(idatData) = 0x78.toByte; fdict(idatData + 1) = 0xBB.toByte
    assert(Media.decodePngPixels(fdict) === None)
  }

  test("decode: PNG payloads take the real pixel path") {
    // all-white 2x2 RGB PNG -> every pixel in the top luma bin
    val white = pngBytes(2, 2, 2, Seq.fill(2)(Seq.fill(6)(255)), Seq(0, 0))
    val feats = Media.decode(Seq(
      MediaRow(20L, "image", white, "image/png", 2, 2, 0L)).toDS()).collect()
    assert(feats.head.feature(15) === 1.0)
  }

  test("corrupt PNG is TERMINAL in decode(): stub path, never the CRC-ignoring ImageIO reader") {
    import graft.operators.Media.{PngCorrupt, PngUnsupported}
    // all-white 2x2 RGB PNG with one IDAT bit flipped and the CRC left
    // stale: provably damaged. ImageIO's PNG reader skips chunk CRCs and
    // would happily decode it (to white here, garbage in general).
    val white = pngBytes(2, 2, 2, Seq.fill(2)(Seq.fill(6)(255)), Seq(0, 0))
    val idatData = 8 + (8 + 13 + 4) + (8 + 14 + 4) + 8
    val corrupt = white.clone(); corrupt(idatData + 3) = (corrupt(idatData + 3) ^ 0x01).toByte
    assert(Media.decodePngDetailed(corrupt) === PngCorrupt)
    val feats = Media.decode(Seq(
      MediaRow(40L, "image", corrupt, "image/png", 2, 2, 0L)).toDS()).collect()
    // stub nibble histogram of the raw bytes, NOT a white-pixel histogram
    assert(feats.head.feature(15) < 1.0, "corrupt PNG must not reach a pixel decoder")

    // Adam7-interlaced PNG (written by the JDK's own writer with
    // progressive mode): a CAPABILITY gap, so it falls through to ImageIO
    // and decodes for real
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 8, 8, Array.fill(64)(0xffffff), 0, 8)
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val adam7 = out.toByteArray
    assert(Media.decodePngDetailed(adam7) === PngUnsupported)
    val f2 = Media.decode(Seq(
      MediaRow(41L, "image", adam7, "image/png", 8, 8, 0L)).toDS()).collect()
    assert(f2.head.feature(15) === 1.0, "interlaced PNG must decode via ImageIO")
  }

  test("decodePngPixels: rejects duplicate IHDR, IDAT-before-IHDR, bad CRC") {
    val ok = pngBytes(2, 2, 2, Seq(Seq(1, 2, 3, 4, 5, 6), Seq(7, 8, 9, 10, 11, 12)), Seq(0, 0))
    // a second IHDR appended before IEND: would redefine geometry after IDAT
    val ihdrChunk = ok.slice(8, 8 + 8 + 13 + 4)
    val dup = ok.dropRight(12) ++ ihdrChunk ++ ok.takeRight(12)
    assert(Media.decodePngPixels(dup) === None)
    // IDAT before any IHDR: strip the IHDR chunk entirely
    val noIhdr = ok.take(8) ++ ok.drop(8 + 8 + 13 + 4)
    assert(Media.decodePngPixels(noIhdr) === None)
    // flip one bit in IDAT data without fixing the chunk CRC
    val idatData = 8 + (8 + 13 + 4) + (8 + 14 + 4) + 8
    val corrupt = ok.clone(); corrupt(idatData) = (corrupt(idatData) ^ 0x40).toByte
    assert(Media.decodePngPixels(corrupt) === None)
  }

  test("decodePngPixels: damaged ANCILLARY chunk is skipped, pixels still decode") {
    val ok = pngBytes(2, 2, 2, Seq(Seq(1, 2, 3, 4, 5, 6), Seq(7, 8, 9, 10, 11, 12)), Seq(0, 0))
    val base = Media.decodePngPixels(ok)
    assert(base.isDefined)
    // flip a bit inside the tEXt chunk's data without fixing its CRC:
    // pixel data is intact, so libpng-style warn-and-skip applies — the
    // decode must NOT be classified corrupt (only critical-chunk CRC
    // failures are terminal)
    val textData = 8 + (8 + 13 + 4) + 8 // sig + IHDR chunk + tEXt len/type
    val damaged = ok.clone(); damaged(textData) = (damaged(textData) ^ 0x40).toByte
    val got = Media.decodePngPixels(damaged)
    assert(got.isDefined)
    assert((got.get._1, got.get._2) === (base.get._1, base.get._2))
    assert(got.get._3.toSeq === base.get._3.toSeq) // Array equality is by ref
  }

  test("targetDims: extreme aspect clamps to 1, wide dims don't overflow Int") {
    // 200x1 at maxSide 64: naive Int math yields height 0, which would
    // make resizePixels throw inside mapPartitions for a VALID image
    assert(Media.targetDims(200, 1, 64) === (64, 1))
    assert(Media.targetDims(1, 200, 64) === (1, 64))
    // w * maxSide overflows Int for ~2^28-wide payloads; Long math keeps
    // the quotient right and the short side clamps to 1
    assert(Media.targetDims(1 << 28, 2, 64) === (64, 1))
  }

  // ---------------------------------------------------------------------
  // ImageIO path (JPEG/GIF/TIFF — JDK java.desktop module): golden pixels
  // for the lossless codecs, dimension + tolerance checks for JPEG.
  // ---------------------------------------------------------------------

  /** Encode pixels through the JDK's own writer for the given format. */
  def imageIoBytes(fmt: String, w: Int, h: Int, px: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px.toArray, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must have a $fmt writer")
    out.toByteArray
  }

  test("decodeImageIOPixels: GIF and TIFF golden pixels round-trip exactly") {
    // 8x8: the JDK GIF writer scrambles sub-8px images (probe-verified),
    // so golden size starts there; <=256 colors keeps GIF lossless
    val px = (0 until 64).map(i => if ((i + i / 8) % 2 == 0) 0xff0000 else 0x0000ff)
    for (fmt <- Seq("gif", "tiff")) {
      val Some((w, h, got)) = Media.decodeImageIOPixels(imageIoBytes(fmt, 8, 8, px))
      assert((w, h) === (8, 8), fmt)
      assert(got.toSeq === px, fmt)
    }
    // TIFF is lossless for arbitrary RGB — multi-color golden too
    val rich = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030, 0xffffff, 0x000000)
    val Some((w, h, got)) = Media.decodeImageIOPixels(imageIoBytes("tiff", 3, 2, rich))
    assert((w, h) === (3, 2))
    assert(got.toSeq === rich)
  }

  test("decodeImageIOPixels: JPEG decodes with lossy tolerance") {
    // uniform mid-gray: JPEG's DC-only block survives within a few codes
    val px = Seq.fill(64)(0x808080)
    val Some((w, h, got)) = Media.decodeImageIOPixels(imageIoBytes("jpg", 8, 8, px))
    assert((w, h) === (8, 8))
    got.foreach { p =>
      for (shift <- Seq(16, 8, 0))
        assert(math.abs(((p >> shift) & 0xff) - 0x80) <= 8, f"channel off: $p%06x")
    }
  }

  test("decodeImageIOPixels: rejects truncated and non-image payloads") {
    val jpeg = imageIoBytes("jpg", 8, 8, Seq.fill(64)(0x808080))
    assert(Media.decodeImageIOPixels(jpeg.take(jpeg.length / 2)) === None)
    assert(Media.decodeImageIOPixels(Array.tabulate[Byte](64)(i => i.toByte)) === None)
    assert(Media.decodeImageIOPixels(Array.emptyByteArray) === None)
  }

  test("decode: JPEG payloads take the real pixel path via ImageIO") {
    val white = imageIoBytes("jpg", 8, 8, Seq.fill(64)(0xffffff))
    val feats = Media.decode(Seq(
      MediaRow(30L, "image", white, "image/jpeg", 8, 8, 0L)).toDS()).collect()
    // all-white survives JPEG to within a few codes -> top luma bins
    assert(feats.head.feature(15) + feats.head.feature(14) === 1.0)
  }

  test("decodeWavPcm: golden samples round-trip, chunk walk skips LIST") {
    val samples = Seq[Short](0, 1000, -1000, 32767, -32768, 42)
    val Some((rate, ch, out)) = Media.decodeWavPcm(wavBytes(16000, 1, samples))
    assert(rate === 16000)
    assert(ch === 1)
    assert(out.toSeq === samples)
    assert(Media.decodeWavPcm(bmpBytes(2, 2, Seq(0, 0, 0, 0))) === None)
  }

  test("decode: dispatches real BMP/WAV decoders, stub only for unknown formats") {
    val white = bmpBytes(4, 4, Seq.fill(16)(0xffffff)) // luma 255 -> bin 15
    val loud = wavBytes(8000, 1, Seq.fill[Short](8)(32767)) // top amplitude bin
    val mediaRows = Seq(
      MediaRow(10L, "image", white, "image/bmp", 4, 4, 0L),
      MediaRow(11L, "audio", loud, "audio/wav", 0, 0, 1L),
      MediaRow(12L, "video", Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70), "video/mp4", 0, 0, 1L))
    val feats = Media.decode(mediaRows.toDS()).collect().map(f => f.media_id -> f.feature).toMap
    assert(feats(10L)(15) === 1.0) // all-white image: all pixels in the top luma bin
    assert(feats(10L).sum === 1.0)
    assert(feats(11L)(15) === 1.0) // max-amplitude samples: top amplitude bin
    assert(feats(12L).sum > 0.99) // stub histogram path still L1-normalized
  }

  test("resizePixels: solid color invariant, corners exact, interior interpolates") {
    val solid = Array.fill(16)(0x336699)
    assert(Media.resizePixels(solid, 4, 4, 2, 2).toSeq === Seq.fill(4)(0x336699))
    // 2x2 black/white checkerboard upscaled to 4x4: each corner clamps to
    // its source pixel; interior positions blend
    val checker = Array(0x000000, 0xffffff, 0xffffff, 0x000000)
    val up = Media.resizePixels(checker, 2, 2, 4, 4)
    assert(up(0) === 0x000000 && up(3) === 0xffffff)
    assert(up(12) === 0xffffff && up(15) === 0x000000)
    val mid = up(5) & 0xff
    assert(mid > 0 && mid < 255, "interior must interpolate")
    // aspect math shared with resizeMeta
    assert(Media.targetDims(1920, 1080, 960) === (960, 540))
    assert(Media.targetDims(640, 480, 960) === (640, 480))
  }

  test("decodeResized: real decode + bilinear resize + histogram of resized pixels") {
    val white = bmpBytes(8, 4, Seq.fill(32)(0xffffff))
    val rows = Seq(
      MediaRow(50L, "image", white, "image/bmp", 8, 4, 0L),
      MediaRow(51L, "data", Array.tabulate[Byte](64)(_.toByte), "application/octet-stream", 0, 0, 0L))
    val out = Media.decodeResized(rows.toDS(), 4).collect().map(f => f.media_id -> f).toMap
    assert((out(50L).target_width, out(50L).target_height) === (4, 2))
    assert(out(50L).feature(15) === 1.0) // still all-white after resampling
    // undecodable payload: stub histogram, (0, 0) dims — output stays total
    assert((out(51L).target_width, out(51L).target_height) === (0, 0))
    assert(math.abs(out(51L).feature.sum - 1.0) < 1e-9)
  }

  test("frameSampleOffsets: evenly spaced within duration, video only") {
    val out = Media.frameSampleOffsets(rows.toDF(), 4).collect()
    assert(out.length === 1) // only the video row
    val offs = out.head.getSeq[Long](1)
    assert(offs === Seq(0L, 2500L, 5000L, 7500L))
  }

  test("resizeMeta: aspect ratio preserved, small media untouched") {
    val out = Media.resizeMeta(rows.toDF(), 960).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getAs[Int]("target_width") === 960)
    assert(out(3L).getAs[Int]("target_height") === 540)
    assert(out(1L).getAs[Int]("target_width") === 640) // already within bounds
    assert(out(1L).getAs[Int]("target_height") === 480)
  }

  test("resizeMeta agrees with targetDims on extreme aspect and wide dims") {
    // the metadata path must publish exactly what the pixel path computes:
    // a 200x1 banner clamps to (64, 1) — not height 0 — and a ~2^28-wide
    // payload must not wrap the Int multiply
    val extreme = Seq(
      (1L, "image", Array.emptyByteArray, "image/bmp", 200, 1, 0L),
      (2L, "image", Array.emptyByteArray, "image/bmp", 1 << 28, 2, 0L))
      .toDF("media_id", "kind", "bytes", "mime", "width", "height", "duration_ms")
    val out = Media.resizeMeta(extreme, 64).collect().map(r => r.getLong(0) -> r).toMap
    assert(
      (out(1L).getAs[Int]("target_width"), out(1L).getAs[Int]("target_height")) ===
        Media.targetDims(200, 1, 64))
    assert(
      (out(2L).getAs[Int]("target_width"), out(2L).getAs[Int]("target_height")) ===
        Media.targetDims(1 << 28, 2, 64))
    // double-division counterexample: side*maxSide > 2^53 rounds UP in a
    // double to an exact multiple of m, off-by-one vs exact Long division
    // — the column path must use integral division to stay in lockstep
    val big = Seq((3L, "image", Array.emptyByteArray, "image/bmp", 542029245, 1566774104, 0L))
      .toDF("media_id", "kind", "bytes", "mime", "width", "height", "duration_ms")
    val bigOut = Media.resizeMeta(big, 58339123).head()
    assert(
      (bigOut.getAs[Int]("target_width"), bigOut.getAs[Int]("target_height")) ===
        Media.targetDims(542029245, 1566774104, 58339123))
  }

  test("audio features: analytic goldens for sine, silence, clipping; total on garbage") {
    import spark.implicits._
    val rate = 8000
    def sine(a: Double, f: Double, n: Int) = Array.tabulate[Short](n)(t =>
      math.round(a * 32767.0 * StrictMath.sin(2 * math.Pi * f * t / rate)).toShort)
    val rows = Seq(
      Media.AudioPayload(1L, Media.encodeWavPcm(rate, 1, sine(0.5, 400, 4000))),
      Media.AudioPayload(2L, Media.encodeWavPcm(rate, 1, new Array[Short](4000))),
      Media.AudioPayload(3L, Media.encodeWavPcm(rate, 1,
        Array.tabulate[Short](4000)(t => if ((t / 10) % 2 == 0) 32767 else -32768))),
      Media.AudioPayload(4L, Array[Byte](1, 2, 3)))
    val out = Media.audioFeatures(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    val s1 = out(1L)
    assert(s1.decoded && s1.sample_rate === rate && s1.channels === 1 && s1.n_frames === 4000L)
    // 400 Hz at 8000 Hz over 4000 samples = 200 exact periods
    assert(math.abs(s1.rms - 0.5 / math.sqrt(2)) < 0.005, s"sine rms ${s1.rms}")
    assert(math.abs(s1.zero_crossing_rate - 2 * 400.0 / rate) < 0.005, s"sine zcr ${s1.zero_crossing_rate}")
    assert(s1.clipping_frac === 0.0)
    assert(s1.silence_frac === 0.0)
    val s2 = out(2L)
    assert(s2.rms === 0.0 && s2.silence_frac === 1.0 && s2.zero_crossing_rate === 0.0)
    val s3 = out(3L)
    assert(s3.clipping_frac > 0.99, s"clipped frac ${s3.clipping_frac}")
    assert(math.abs(s3.rms - 1.0) < 0.01)
    assert(!out(4L).decoded)
  }

  test("encodeWavPcm round-trips through decodeWavPcm exactly") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val decoded = Media.decodeWavPcm(Media.encodeWavPcm(44100, 2, samples))
    assert(decoded.isDefined)
    val (r, c, back) = decoded.get
    assert(r === 44100 && c === 2 && back === samples)
  }

  // ---------------------------------------------------------------
  // MP3 frame-header parsing (public-spec sync-frame arithmetic)
  // ---------------------------------------------------------------

  test("parseMp3: single MPEG1 Layer III frame golden") {
    // index 9 = 128 kbps at 44100 Hz stereo: frame = 144*128000/44100 = 417 B
    val b = Media.encodeMp3(Seq(9))
    assert(b.length === 417)
    val m = Media.parseMp3(b).get
    assert(m.version === "MPEG1" && m.layer === 3)
    assert(m.sample_rate === 44100 && m.channels === 2)
    assert(m.bitrate_kbps === 128 && m.n_frames === 1 && !m.vbr)
    assert(m.duration_ms === math.round(1000.0 * 1152 / 44100)) // 26 ms
  }

  test("parseMp3: ID3v2 prefix skipped via syncsafe size, ID3v1 trailer ignored") {
    val b = Media.encodeMp3(Seq(9, 9, 9), id3v2PadBytes = 200, id3v1Trailer = true)
    val m = Media.parseMp3(b).get
    assert(m.n_frames === 3 && !m.vbr)
    // a syncsafe size crossing the 7-bit boundary (value 200 > 127)
    assert(b(8) === ((200 >> 7) & 0x7f).toByte && b(9) === (200 & 0x7f).toByte)
  }

  test("parseMp3: VBR detected, bitrate reported from the first frame") {
    val m = Media.parseMp3(Media.encodeMp3(Seq(9, 11, 9, 11))).get
    assert(m.vbr && m.bitrate_kbps === 128 && m.n_frames === 4)
  }

  test("parseMp3: per-frame padding changes stride but not facts") {
    val padded = Media.encodeMp3(Seq(9, 9, 9, 9), padFrame = _ % 2 == 0)
    val plain = Media.encodeMp3(Seq(9, 9, 9, 9))
    assert(padded.length === plain.length + 2)
    val m = Media.parseMp3(padded).get
    assert(m.n_frames === 4 && m.bitrate_kbps === 128 && !m.vbr)
  }

  test("parseMp3: MPEG2.5 Layer III uses 576 samples/frame and the low-rate table") {
    // vBits 0 = MPEG2.5, srIdx 2 = 8000 Hz, index 5 = 40 kbps
    // frame = 72*40000/8000 = 360 B; duration = round(1000*2*576/8000) = 144
    val b = Media.encodeMp3(Seq(5, 5), vBits = 0, srIdx = 2, mono = true)
    assert(b.length === 720)
    val m = Media.parseMp3(b).get
    assert(m.version === "MPEG2.5" && m.sample_rate === 8000 && m.channels === 1)
    assert(m.bitrate_kbps === 40 && m.n_frames === 2 && m.duration_ms === 144L)
  }

  test("parseMp3: Layer I counts 4-byte slots (MPEG1, 384 samples/frame)") {
    // index 4 = 128 kbps Layer I at 44100: (12*128000/44100)*4 = 34*4 = 136 B
    val b = Media.encodeMp3(Seq(4), layer = 1)
    assert(b.length === 136)
    val m = Media.parseMp3(b).get
    assert(m.layer === 1 && m.bitrate_kbps === 128)
    assert(m.duration_ms === math.round(1000.0 * 384 / 44100))
  }

  test("parseMp3: resyncs over junk between frames; counts a header-intact truncated tail") {
    val f = Media.encodeMp3(Seq(9))
    val junk = Array[Byte](0x12, 0x34, -1) // 0xFF alone is not a sync (next byte fails)
    val m = Media.parseMp3(f ++ junk ++ f).get
    assert(m.n_frames === 2)
    // a final frame cut off mid-payload still has a parseable header
    val t = Media.parseMp3(f ++ f.take(10)).get
    assert(t.n_frames === 2)
  }

  test("parseMp3: garbage, free-format, and reserved headers yield None") {
    assert(Media.parseMp3(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(Media.parseMp3(Array.empty[Byte]).isEmpty)
    // free format (bitrate index 0): valid sync but unknowable length
    val free = Array[Byte](0xff.toByte, 0xfb.toByte, 0x00, 0x00)
    assert(Media.parseMp3(free).isEmpty)
    // reserved version bits (01) and reserved layer (00)
    assert(Media.parseMp3(Array[Byte](0xff.toByte, 0xeb.toByte, 0x90.toByte, 0)).isEmpty)
    assert(Media.parseMp3(Array[Byte](0xff.toByte, 0xf9.toByte, 0x90.toByte, 0)).isEmpty)
  }

  test("encodeBmp24 round-trips through decodeBmpPixels, padding included") {
    // 3-wide rows take 9 data bytes + 3 pad bytes — exercises the 4-byte
    // row alignment both directions; distinct per-channel values catch a
    // swapped B/G/R order
    val px = Array(0x112233, 0x445566, 0x778899, 0xaabbcc, 0xddeeff, 0x010203)
    val Some((w, h, back)) = Media.decodeBmpPixels(Media.encodeBmp24(3, 2, px))
    assert(w === 3 && h === 2 && back.toSeq === px.toSeq)
  }

  test("dHash64: horizontal gradient = all ones, flat = zero, 9x8 is identity") {
    val inc = Array.tabulate(72)(p => { val g = (p % 9) * 20; (g << 16) | (g << 8) | g })
    assert(Media.dHash64(9, 8, inc) === -1L) // every comparison rises: 64 set bits
    assert(Media.dHash64(9, 8, Array.fill(72)(0x808080)) === 0L)
    // one dark cell at (x=3, y=2) flips exactly bits 18 (2..3 falls) and
    // 19 (3..4 rises) relative to flat — pins the bit-index packing
    val one = Array.fill(72)(0x808080); one(2 * 9 + 3) = 0
    assert(Media.dHash64(9, 8, one) === ((1L << 19))) // bit 18 stays 0 (fall), 19 rises
  }

  test("dHash64 on a larger image equals dHash of its bilinear 9x8 resize") {
    val px = Array.tabulate(36 * 16) { i => val g = (i * 37) % 256; (g << 16) | (g << 8) | g }
    val resized = Media.resizePixels(px, 36, 16, 9, 8)
    assert(Media.dHash64(36, 16, px) === Media.dHash64(9, 8, resized))
  }

  test("perceptualHashes: decode ladder is total; BMP and PNG agree on pixels") {
    val grid = Array.tabulate(72)(p => { val g = (p * 53) % 256 ; (g << 16) | (g << 8) | g })
    val bmp = Media.encodeBmp24(9, 8, grid)
    val expected = Media.dHash64(9, 8, grid)
    val payloads = Seq(
      Media.ImagePayload(1L, bmp),
      Media.ImagePayload(2L, Array.fill[Byte](64)(0x7f)))
    val out = Media.perceptualHashes(payloads.toDS()).collect().map(p => p.media_id -> p).toMap
    assert(out(1L).decoded && out(1L).phash === expected)
    assert(!out(2L).decoded && out(2L).phash === 0L)
  }

  test("mp3Meta: distributed parse is total over mixed payloads") {
    val payloads = Seq(
      Media.AudioPayload(1L, Media.encodeMp3(Seq(9, 9))),
      Media.AudioPayload(2L, Array.fill[Byte](32)(0x00)),
      Media.AudioPayload(3L, Media.encodeMp3(Seq(1, 14), vBits = 2, srIdx = 1, mono = true)))
    val out = Media.mp3Meta(payloads.toDS()).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).decoded && out(1L).n_frames === 2 && out(1L).bitrate_kbps === 128)
    assert(!out(2L).decoded && out(2L).version === "")
    assert(out(3L).decoded && out(3L).version === "MPEG2" && out(3L).sample_rate === 24000)
    assert(out(3L).vbr && out(3L).bitrate_kbps === 8 && out(3L).channels === 1)
  }
}
