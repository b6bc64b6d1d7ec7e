package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (brief extension surface). BMP (24-bit BI_RGB) and WAV
  * (16-bit PCM) are decoded with plain byte math; PNG (8-bit
  * gray/RGB/RGBA, non-interlaced) is decoded for real too — its DEFLATE
  * stream needs only the JDK's Inflater. JPEG/GIF/TIFF (and any PNG
  * variant the hand decoder declines, e.g. palette or interlaced) decode
  * through the JDK's own ImageIO registry (`java.desktop` module — still
  * no external library). Only codecs genuinely absent from the JDK
  * (MP3/H.264...) fall back to a clearly-marked deterministic stub — the
  * Spark-side plumbing (schema, binary columns, partition-parallel batch
  * processing, feature-vector shape) is identical either way, and a
  * production deployment adds codec branches to `decode` with the same
  * signature.
  *
  * Scale posture: everything is per-row/per-partition — no shuffle. Decode
  * runs via mapPartitions so per-partition setup (codec init in real life)
  * amortizes across rows, the same batch shape a Pandas-UDF/Arrow path
  * gives PySpark users.
  */
object Media {

  /** Typed media row: kind in {image, audio, video}, opaque payload,
    * sidecar metadata.
    */
  case class MediaRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, feature: Array[Double])

  /** Payload-level metadata from the binary column alone — pure column
    * math: size, content hash, leading magic bytes (the standard
    * sniff-don't-trust-the-extension check).
    */
  def mediaMeta(df: DataFrame): DataFrame =
    df.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).cast("long").as("size_bytes"),
      sha2(col("bytes"), 256).as("content_sha"),
      hex(substring(col("bytes"), 1, 4)).as("magic_hex"))

  // -------------------------------------------------------------------
  // Real decoders for uncompressed formats (plain byte math, no codec lib).
  // -------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Decode an uncompressed 24-bit BI_RGB Windows BMP: (width, height,
    * row-major top-down packed 0xRRGGBB pixels). Handles the format's two
    * traps — rows are stored bottom-up (top-down when height is negative)
    * and padded to 4-byte boundaries. Returns None for anything that is
    * not a well-formed 24bpp uncompressed BMP (wrong magic, other bit
    * depths, RLE compression, truncated pixel array).
    */
  def decodeBmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val off = i32le(b, 10)
    val hdrSize = i32le(b, 14)
    val w = i32le(b, 18)
    val hRaw = i32le(b, 22)
    val bpp = u16le(b, 28)
    val comp = i32le(b, 30)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 || comp != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // width math in LONG: a hostile header with w near Int.MaxValue wraps
    // `w * 3 + 3` negative in 32-bit, defeating the size check below and
    // crashing on allocation instead of returning None
    val rowBytes = ((w.toLong * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowBytes * h > b.length) return None
    // reachable only when the payload really holds w*h*3 bytes, so w*h
    // fits an Int here; the guard above bounds it by b.length
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = off + srcRow * rowBytes.toInt
      var x = 0
      while (x < w) {
        val i = base + x * 3 // stored B, G, R
        px(y * w + x) = (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Decode a RIFF/WAVE file holding 16-bit integer PCM: (sampleRate,
    * channels, interleaved samples). Walks the chunk list (chunks are not
    * guaranteed to be just fmt+data — LIST/fact chunks appear in the wild)
    * and returns None for non-PCM encodings or other bit depths.
    */
  def decodeWavPcm(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var rate = 0
    var channels = 0
    var fmtOk = false
    var samples: Array[Short] = null
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = i32le(b, pos + 4)
      val dataStart = pos + 8
      // LONG comparison: a declared size near Int.MaxValue wraps
      // `dataStart + size` negative in 32-bit and bypasses this guard
      if (size < 0 || dataStart.toLong + size > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = u16le(b, dataStart)
          channels = u16le(b, dataStart + 2)
          rate = i32le(b, dataStart + 4)
          val bits = u16le(b, dataStart + 14)
          // rate > 0 is part of well-formedness: broken encoders emit
          // rate 0, which would poison every duration/frame computation
          // downstream (audioFeatures' silence window, duration_sec)
          fmtOk = audioFormat == 1 && bits == 16 && channels > 0 && rate > 0
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = (u8(b, dataStart + 2 * i) | (b(dataStart + 2 * i + 1) << 8)).toShort
            i += 1
          }
        case _ => // skip LIST/fact/cue chunks
      }
      pos = dataStart + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && samples != null) Some((rate, channels, samples)) else None
  }

  /** Encode 16-bit integer PCM as a minimal RIFF/WAVE file — the inverse
    * of [[decodeWavPcm]] (round-trip pinned in MediaSpec); also the
    * deterministic synthesizer substrate for audio-feature testing.
    */
  def encodeWavPcm(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0 && channels > 0, "rate and channels must be positive")
    // RIFF sizes are 32-bit: past this bound length*2 wraps negative
    // (NegativeArraySizeException) or writes wrapped size fields that
    // decodeWavPcm would reject — fail with a clear message instead
    require(samples.length <= (Int.MaxValue - 44) / 2,
      s"${samples.length} samples exceed the 32-bit RIFF size limit")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def putS(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, i)
    def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    putS(0, "RIFF"); put32(4, 36 + dataBytes); putS(8, "WAVE")
    putS(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, channels)
    put32(24, rate); put32(28, rate * channels * 2); put16(32, channels * 2); put16(34, 16)
    putS(36, "data"); put32(40, dataBytes)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  case class AudioPayload(media_id: Long, bytes: Array[Byte])

  case class AudioFeatures(
      media_id: Long,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double,
      zero_crossing_rate: Double,
      clipping_frac: Double,
      silence_frac: Double)

  /** Frame-level audio quality features over decoded 16-bit PCM — the
    * signals a speech-corpus curation pass filters on:
    *
    *   - `rms`: overall level, normalized to [-1, 1] full scale (dead or
    *     too-quiet recordings drop out at a floor);
    *   - `zero_crossing_rate`: sign changes per sample of the
    *     channel-mixed signal — the classic cheap spectral proxy
    *     (voiced speech low, fricatives/noise high);
    *   - `clipping_frac`: fraction of raw samples at |s| >= 32760 —
    *     recordings damaged by gain clipping;
    *   - `silence_frac`: fraction of SAMPLES lying in 25 ms frames whose
    *     RMS is under 1% FS (sample-weighted, so a sub-frame tail cannot
    *     carry a full frame's weight) — mostly-silence payloads waste
    *     tokens downstream.
    *
    * Undecodable payloads emit decoded = false with zeroed features, so
    * the output stays total. Per-row mapPartitions, no shuffle, pure
    * deterministic JVM math — same posture as [[decodeResized]].
    */
  def audioFeatures(df: Dataset[AudioPayload]): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeWavPcm(r.bytes) match {
          case None =>
            AudioFeatures(r.media_id, decoded = false, 0, 0, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)
          case Some((rate, channels, samples)) =>
            val nFrames = samples.length / channels
            val mono = new Array[Double](nFrames)
            var i = 0
            while (i < nFrames) {
              var acc = 0.0
              var c = 0
              while (c < channels) { acc += samples(i * channels + c); c += 1 }
              mono(i) = acc / channels / 32768.0
              i += 1
            }
            var sumSq = 0.0
            var crossings = 0
            var clipped = 0
            // crossings compare against the last NONZERO sign: a sampled
            // sine whose frequency divides the rate lands exactly on 0.0
            // at every crossing, and a naive product test counts none
            var lastSign = 0
            i = 0
            while (i < nFrames) {
              sumSq += mono(i) * mono(i)
              val sg = if (mono(i) > 0) 1 else if (mono(i) < 0) -1 else 0
              if (sg != 0) {
                if (lastSign != 0 && sg != lastSign) crossings += 1
                lastSign = sg
              }
              i += 1
            }
            // scan nFrames * channels, not samples.length: a data chunk
            // that is not frame-aligned leaves orphan trailing samples no
            // other feature sees — clipping must use the same population
            i = 0
            while (i < nFrames * channels) {
              if (samples(i) >= 32760 || samples(i) <= -32760) clipped += 1
              i += 1
            }
            // silence weighted by SAMPLES in silent windows, not window
            // count: a 1 ms tail window would otherwise carry the weight
            // of a full 25 ms frame
            val frameLen = math.max(1, rate / 40) // 25 ms
            var silentSamples = 0L
            var start = 0
            while (start < nFrames) {
              val end = math.min(nFrames, start + frameLen)
              var s = 0.0
              var j = start
              while (j < end) { s += mono(j) * mono(j); j += 1 }
              if (math.sqrt(s / (end - start)) < 0.01) silentSamples += end - start
              start = end
            }
            AudioFeatures(
              r.media_id, decoded = true, rate, channels, nFrames.toLong,
              nFrames.toDouble / rate,
              if (nFrames > 0) math.sqrt(sumSq / nFrames) else 0.0,
              if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0,
              if (nFrames > 0) clipped.toDouble / (nFrames * channels) else 0.0,
              if (nFrames > 0) silentSamples.toDouble / nFrames else 0.0)
        }
      }
    }
  }

  // -------------------------------------------------------------------
  // MP3 frame-header metadata (ISO/IEC 11172-3 / 13818-3 header layout —
  // public-spec arithmetic over sync frames; no codec, no decode).
  // Speech-corpus curation hits MP3 constantly: sample rate, channel
  // mode, bitrate, frame count, and a duration estimate all come from
  // the 4-byte frame headers alone.
  // -------------------------------------------------------------------

  /** Parsed whole-file MP3 facts. `bitrate_kbps` is the FIRST frame's
    * (the value a CBR pipeline keys on); `vbr` reports whether any later
    * frame differs. `duration_ms` = total samples over the first frame's
    * sample rate (mixed-rate streams are out of contract, as they are for
    * every real tool that estimates duration without decoding).
    */
  case class Mp3Info(
      version: String, // MPEG1 | MPEG2 | MPEG2.5
      layer: Int, // 1..3
      sample_rate: Int,
      channels: Int,
      bitrate_kbps: Int,
      n_frames: Int,
      duration_ms: Long,
      vbr: Boolean)

  /** One frame header's facts; `frame_bytes` is the walk stride. */
  private case class Mp3FrameHeader(
      version: String,
      layer: Int,
      rate: Int,
      channels: Int,
      kbps: Int,
      samplesPerFrame: Int,
      frameBytes: Int)

  // bitrate tables in kbps, indexed 0..13 by (header bitrate index - 1);
  // key = (version group 1|2, layer). MPEG2 and 2.5 share tables.
  private val Mp3Kbps: Map[(Int, Int), Array[Int]] = Map(
    (1, 1) -> Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2) -> Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3) -> Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1) -> Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2) -> Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3) -> Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  // sample-rate tables indexed by the header's 2-bit rate field; key =
  // the header's 2-bit version field (3=MPEG1, 2=MPEG2, 0=MPEG2.5)
  private val Mp3Rates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  /** Validate + decode the 4-byte frame header at offset `i`, or None. */
  private def mp3Header(b: Array[Byte], i: Int): Option[Mp3FrameHeader] = {
    if (i + 4 > b.length) return None
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return None
    val vBits = (u8(b, i + 1) >> 3) & 3
    val lBits = (u8(b, i + 1) >> 1) & 3
    val brIdx = (u8(b, i + 2) >> 4) & 15
    val srIdx = (u8(b, i + 2) >> 2) & 3
    val padding = (u8(b, i + 2) >> 1) & 1
    // reserved version (01), reserved layer (00), bad sample-rate index
    // (11), bad bitrate (1111) and "free format" (0000 — frame length is
    // unknowable without decoding) all fail validation; the walk resyncs
    if (vBits == 1 || lBits == 0 || srIdx == 3 || brIdx == 0 || brIdx == 15) return None
    val layer = 4 - lBits
    val group = if (vBits == 3) 1 else 2
    val kbps = Mp3Kbps((group, layer))(brIdx - 1)
    val rate = Mp3Rates(vBits)(srIdx)
    val spf =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (group == 1) 1152
      else 576 // MPEG2/2.5 Layer III
    // ISO frame-length arithmetic (integer division): Layer I counts
    // 4-byte slots; II/III count bytes as spf/8 * bitrate / rate
    val frameBytes =
      if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
      else spf / 8 * (kbps * 1000) / rate + padding
    val channels = if (((u8(b, i + 3) >> 6) & 3) == 3) 1 else 2
    val version = if (vBits == 3) "MPEG1" else if (vBits == 2) "MPEG2" else "MPEG2.5"
    Some(Mp3FrameHeader(version, layer, rate, channels, kbps, spf, frameBytes))
  }

  /** Walk the sync frames of an MP3 payload: skip a leading ID3v2 tag
    * (syncsafe size), then stride frame to frame by each header's length,
    * resynchronizing byte-by-byte over junk (an ID3v1 "TAG" trailer, a
    * truncated last frame, stray garbage — none contain a valid sync
    * header, so they are skipped without being counted). None when no
    * valid frame exists.
    */
  def parseMp3(b: Array[Byte]): Option[Mp3Info] = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2 size is 4 syncsafe bytes (7 bits each), excluding the header
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + size
    }
    var first: Mp3FrameHeader = null
    var nFrames = 0
    var totalSamples = 0L
    var vbr = false
    while (i + 4 <= b.length) {
      mp3Header(b, i) match {
        case Some(h) if h.frameBytes >= 4 =>
          if (first == null) first = h
          else if (h.kbps != first.kbps) vbr = true
          nFrames += 1
          totalSamples += h.samplesPerFrame
          i += h.frameBytes
        case _ => i += 1 // resync scan
      }
    }
    if (first == null) None
    else Some(Mp3Info(
      first.version, first.layer, first.rate, first.channels, first.kbps,
      nFrames, math.round(1000.0 * totalSamples / first.rate), vbr))
  }

  /** Synthesize a valid MP3 frame stream — the encode side of
    * [[parseMp3]] for tests and the deterministic-fixture queries: each
    * frame gets a spec-correct header and a zeroed payload of exactly the
    * header's frame length (0x00 never contains a sync pattern, so the
    * walk sees precisely these frames).
    *
    * @param frameKbpsIdx per-frame bitrate index (1..14); varying indices
    *                     make a VBR stream
    * @param vBits        header version field: 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    * @param layer        1..3
    * @param srIdx        sample-rate index 0..2
    * @param mono         single-channel mode flag
    * @param padFrame     per-frame padding bit
    */
  def encodeMp3(
      frameKbpsIdx: Seq[Int],
      vBits: Int = 3,
      layer: Int = 3,
      srIdx: Int = 0,
      mono: Boolean = false,
      padFrame: Int => Boolean = _ => false,
      id3v2PadBytes: Int = -1,
      id3v1Trailer: Boolean = false): Array[Byte] = {
    require(Set(3, 2, 0)(vBits) && layer >= 1 && layer <= 3 && srIdx >= 0 && srIdx <= 2)
    require(frameKbpsIdx.nonEmpty && frameKbpsIdx.forall(x => x >= 1 && x <= 14))
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    if (id3v2PadBytes >= 0) {
      out ++= "ID3".getBytes("US-ASCII")
      out += 3; out += 0; out += 0 // v2.3, flags 0
      out += ((id3v2PadBytes >> 21) & 0x7f).toByte
      out += ((id3v2PadBytes >> 14) & 0x7f).toByte
      out += ((id3v2PadBytes >> 7) & 0x7f).toByte
      out += (id3v2PadBytes & 0x7f).toByte
      out ++= new Array[Byte](id3v2PadBytes)
    }
    val group = if (vBits == 3) 1 else 2
    frameKbpsIdx.zipWithIndex.foreach { case (idx, f) =>
      val pad = if (padFrame(f)) 1 else 0
      val kbps = Mp3Kbps((group, layer))(idx - 1)
      val rate = Mp3Rates(vBits)(srIdx)
      val frameBytes =
        if (layer == 1) (12 * kbps * 1000 / rate + pad) * 4
        else (if (layer == 2 || group == 1) 144 else 72) * (kbps * 1000) / rate + pad
      out += 0xff.toByte
      out += (0xe0 | (vBits << 3) | ((4 - layer) << 1) | 1).toByte // protection bit off
      out += ((idx << 4) | (srIdx << 2) | (pad << 1)).toByte
      out += (if (mono) 0xc0 else 0x00).toByte
      out ++= new Array[Byte](frameBytes - 4)
    }
    if (id3v1Trailer) {
      val tag = new Array[Byte](128)
      "TAG".getBytes("US-ASCII").copyToArray(tag)
      out ++= tag
    }
    out.toArray
  }

  case class Mp3Meta(
      media_id: Long,
      decoded: Boolean,
      version: String,
      layer: Int,
      sample_rate: Int,
      channels: Int,
      bitrate_kbps: Int,
      n_frames: Int,
      duration_ms: Long,
      vbr: Boolean)

  /** MP3 header metadata over a binary payload column — per-row
    * mapPartitions, no shuffle, total output (unparseable payloads emit
    * decoded = false with zeroed facts), the [[audioFeatures]] posture.
    */
  def mp3Meta(df: Dataset[AudioPayload]): Dataset[Mp3Meta] = {
    implicit val enc = Encoders.product[Mp3Meta]
    df.mapPartitions { rows =>
      rows.map { r =>
        parseMp3(r.bytes) match {
          case Some(m) => Mp3Meta(
            r.media_id, decoded = true, m.version, m.layer, m.sample_rate,
            m.channels, m.bitrate_kbps, m.n_frames, m.duration_ms, m.vbr)
          case None =>
            Mp3Meta(r.media_id, decoded = false, "", 0, 0, 0, 0, 0, 0L, vbr = false)
        }
      }
    }
  }

  private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Decoder allocation cap for the inflated scanline buffer (256 MB): a
    * hostile IHDR can declare dimensions whose raw size OOMs before the
    * DEFLATE stream is even read — past the cap we return None instead of
    * allocating.
    */
  private val MaxRawBytes: Long = 1L << 28

  private val PngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Tri-state PNG decode result. Integrity failures are TERMINAL: the
    * payload claims to be a PNG and is provably damaged (bad chunk CRC,
    * duplicate IHDR, IDAT before IHDR, truncated stream) — handing it to
    * a CRC-ignoring fallback decoder would resurrect exactly the garbage
    * pixels the checks exist to reject. Unsupported-feature results
    * (palette, 16-bit, Adam7 — or not a PNG at all) fall through to the
    * ImageIO path, which handles those variants correctly.
    */
  private[graft] sealed trait PngDecode
  private[graft] final case class PngOk(w: Int, h: Int, px: Array[Int]) extends PngDecode
  private[graft] case object PngCorrupt extends PngDecode
  private[graft] case object PngUnsupported extends PngDecode

  /** Decode an 8-bit-depth non-interlaced PNG (color types 0 gray, 2 RGB,
    * 4 gray+alpha, 6 RGBA — the overwhelming majority of real PNGs):
    * (width, height, row-major top-down packed 0xRRGGBB pixels; alpha
    * dropped, gray replicated). Real decode end to end: chunk walk, IDAT
    * concatenation, JDK-Inflater DEFLATE decompression, and per-scanline
    * unfiltering (None/Sub/Up/Average/Paeth). Returns None for palette or
    * 16-bit or Adam7-interlaced images, truncated streams, and hostile
    * headers (long-math size guards, allocation cap); [[decodePngDetailed]]
    * additionally distinguishes corrupt from unsupported.
    */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePngDetailed(b) match {
      case PngOk(w, h, px) => Some((w, h, px))
      case _ => None
    }

  private[graft] def decodePngDetailed(b: Array[Byte]): PngDecode = {
    if (b.length < 8 + 25 || !PngMagic.indices.forall(i => b(i) == PngMagic(i)))
      return PngUnsupported // not a PNG at all (or too short to ever be)
    var pos = 8
    var w = 0; var h = 0; var bpp = 0; var colorType = -1
    var ihdrSeen = false
    // stream accumulation, not Array ++: a hostile PNG split into 1-byte
    // IDAT chunks would make repeated array concatenation quadratic
    val idatBuf = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (pos + 8 <= b.length && !sawEnd) {
      val len = i32be(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val dataStart = pos + 8
      // LONG math: a declared length near Int.MaxValue wraps the bound
      // check in 32-bit arithmetic
      if (len < 0 || dataStart.toLong + len + 4 > b.length) return PngCorrupt
      // per-chunk CRC over type+data: corrupted or crafted chunks fail
      // here instead of decoding to garbage pixels. Only CRITICAL chunks
      // (uppercase first type letter — IHDR/PLTE/IDAT/IEND) are terminal:
      // a damaged tEXt/pHYs leaves the pixels fully recoverable, and
      // libpng-family decoders warn-and-skip ancillary CRC failures, so
      // an ancillary mismatch skips just that chunk.
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + len)
      val crcOk = crc.getValue.toInt == i32be(b, dataStart + len)
      val critical = (b(pos + 4) & 0x20) == 0
      if (!crcOk && critical) return PngCorrupt
      if (crcOk) typ match {
        case "IHDR" =>
          // a second IHDR after IDAT would silently redefine the geometry
          // the accumulated IDAT bytes are interpreted with
          if (ihdrSeen || len < 13) return PngCorrupt
          ihdrSeen = true
          w = i32be(b, dataStart)
          h = i32be(b, dataStart + 4)
          val bitDepth = u8(b, dataStart + 8)
          colorType = u8(b, dataStart + 9)
          val interlace = u8(b, dataStart + 12)
          bpp = colorType match {
            case 0 => 1 case 2 => 3 case 4 => 2 case 6 => 4 case _ => -1
          }
          if (w <= 0 || h <= 0) return PngCorrupt
          // features this decoder declines but a full decoder handles
          if (bitDepth != 8 || bpp < 0 ||
            u8(b, dataStart + 10) != 0 || u8(b, dataStart + 11) != 0 || interlace != 0)
            return PngUnsupported
        case "IDAT" =>
          if (!ihdrSeen) return PngCorrupt // IDAT before IHDR: no geometry
          idatBuf.write(b, dataStart, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks (tEXt, pHYs, gAMA, ...) skipped
      }
      pos = dataStart + len + 4 // skip CRC
    }
    val idat = idatBuf.toByteArray
    if (w == 0 || idat.isEmpty) return PngCorrupt
    val stride = 1L + w.toLong * bpp // <= ~2^33, cannot overflow a long
    // divide-form bound: `stride * h` itself can overflow LONG for hostile
    // 2^31-scale dimensions, silently passing a product-form check.
    // Past-cap = capability refusal, not proof of damage — but the
    // ImageIO path enforces the same cap pre-decode, so a hostile header
    // still ends at the stub without a giant allocation anywhere.
    if (h > MaxRawBytes / stride) return PngUnsupported
    val rawSize = stride * h
    val raw = new Array[Byte](rawSize.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat)
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 without finishing means no progress is possible: a
        // truncated stream (needsInput) OR a preset-dictionary zlib header
        // (needsDictionary — never valid in PNG and otherwise an infinite
        // loop: inflate would return 0 forever)
        if (n == 0) return PngCorrupt
        got += n
      }
      if (got < raw.length) return PngCorrupt
    } catch { case _: java.util.zip.DataFormatException => return PngCorrupt }
    finally inflater.end()

    // unfilter scanlines in place over prev/cur row byte windows
    val rowLen = w * bpp
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = y * stride.toInt
      val filter = u8(raw, base)
      val cur = base + 1
      val prev = cur - stride.toInt
      var i = 0
      while (i < rowLen) {
        val a = if (i >= bpp) u8(raw, cur + i - bpp) else 0 // left
        val up = if (y > 0) u8(raw, prev + i) else 0 // above
        val c = if (y > 0 && i >= bpp) u8(raw, prev + i - bpp) else 0 // up-left
        val recon = filter match {
          case 0 => u8(raw, cur + i)
          case 1 => u8(raw, cur + i) + a
          case 2 => u8(raw, cur + i) + up
          case 3 => u8(raw, cur + i) + ((a + up) / 2)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
            u8(raw, cur + i) + pred
          case _ => return PngCorrupt // 5+ is not a defined filter type
        }
        raw(cur + i) = (recon & 0xff).toByte
        i += 1
      }
      var x = 0
      while (x < w) {
        val s = cur + x * bpp
        px(y * w + x) = colorType match {
          case 0 | 4 => val g = u8(raw, s); (g << 16) | (g << 8) | g
          case _ => (u8(raw, s) << 16) | (u8(raw, s + 1) << 8) | u8(raw, s + 2)
        }
        x += 1
      }
      y += 1
    }
    PngOk(w, h, px)
  }

  /** 16-bin L1-normalized luminance histogram over decoded pixels (BT.601
    * integer luma, binned by high nibble).
    */
  private def lumaHistogram(px: Array[Int]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
      hist(luma >> 4) += 1.0
      i += 1
    }
    val n = math.max(1.0, px.length.toDouble)
    hist.map(_ / n)
  }

  /** 16-bin L1-normalized amplitude histogram over PCM samples (full
    * 16-bit range split into 16 equal buckets).
    */
  private def amplitudeHistogram(samples: Array[Short]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < samples.length) {
      hist((samples(i) + 32768) >> 12) += 1.0
      i += 1
    }
    val n = math.max(1.0, samples.length.toDouble)
    hist.map(_ / n)
  }

  /** Decode a compressed raster image via the JDK's own ImageIO registry
    * (JPEG, GIF, TIFF, WBMP — all in OpenJDK's `java.desktop` module, no
    * external library; also catches PNG variants the hand decoder
    * declines, e.g. palette or Adam7-interlaced). Dimensions are read
    * from the header FIRST and checked against the allocation cap before
    * any pixel decode, so a hostile header cannot force a giant
    * allocation. Pixels come back row-major top-down packed 0xRRGGBB
    * (alpha dropped), matching the hand-written BMP/PNG decoders.
    * Returns None for truncated, malformed, or unregistered payloads.
    */
  def decodeImageIOPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    // MemoryCacheImageInputStream: pure in-memory, no executor temp files
    // (the default createImageInputStream spills to a disk cache)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        // 4 bytes/pixel under the same cap the PNG path enforces
        if (w <= 0 || h <= 0 || w.toLong > (MaxRawBytes / 4) / h) return None
        val img = reader.read(0)
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        var i = 0
        while (i < px.length) { px(i) &= 0xffffff; i += 1 }
        Some((w, h, px))
      } finally reader.dispose()
    } catch {
      // ImageIO readers throw IOException/IIOException/RuntimeException
      // variants on truncated or crafted payloads — all mean "undecodable"
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** Raw-byte nibble histogram — the STUB path for codecs genuinely
    * absent from the JDK (MP3/H.264; PNG decodes via the Inflater,
    * JPEG/GIF/TIFF via ImageIO): a deterministic per-payload feature
    * with the exact shape a real decoder + extractor would produce.
    */
  private def nibbleHistogram(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1.0, bytes.length.toDouble)
    hist.map(_ / n)
  }

  /** Decode + feature-extract: REAL decode for BMP/PNG (hand decoders),
    * JPEG/GIF/TIFF (JDK ImageIO) — pixels -> luminance histogram — and
    * WAV (PCM samples -> amplitude histogram); deterministic stub
    * histogram only for codecs absent from the JDK. All paths emit the
    * same fixed-width L1-normalized Array[Double], so downstream
    * consumers (similarity search, dedup on features) are agnostic to
    * which decoder ran. The hand decoders run first: no AWT machinery on
    * the overwhelmingly-common uncompressed paths.
    */
  def decode(df: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    df.mapPartitions { rows =>
      // per-partition init would open heavier codecs once here
      rows.map { r =>
        val feature = decodeBmpPixels(r.bytes) match {
          case Some((_, _, px)) => lumaHistogram(px)
          case None =>
            decodePngDetailed(r.bytes) match {
              case PngOk(_, _, px) => lumaHistogram(px)
              // provably-damaged PNG: TERMINAL. ImageIO's PNG reader skips
              // chunk CRCs, so falling through would decode exactly the
              // garbage pixels the integrity checks reject.
              case PngCorrupt => nibbleHistogram(r.bytes)
              case PngUnsupported =>
                decodeImageIOPixels(r.bytes)
                  .map { case (_, _, px) => lumaHistogram(px) }
                  .orElse(decodeWavPcm(r.bytes).map { case (_, _, s) => amplitudeHistogram(s) })
                  .getOrElse(nibbleHistogram(r.bytes))
            }
        }
        MediaFeatures(r.media_id, r.kind, feature)
      }
    }
  }

  /** Former name of [[decode]], kept so round-2 call sites keep working;
    * the BMP/WAV paths are no longer stubs.
    */
  def decodeStub(df: Dataset[MediaRow]): Dataset[MediaFeatures] = decode(df)

  /** Deterministic frame-sample offsets for video rows: n evenly-spaced
    * timestamps within [0, duration) — pure column math; the frame EXTRACT
    * at those offsets is decoder territory (see decodeStub).
    */
  def frameSampleOffsets(df: DataFrame, n: Int): DataFrame =
    df.filter(col("kind") === "video")
      .select(
        col("media_id"),
        transform(
          sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long")).as("sample_offsets_ms"))

  /** Bilinear resample of row-major packed 0xRRGGBB pixels to
    * (tw, th) — pixel-center mapping (sx = (x+0.5)*w/tw - 0.5), edge
    * clamp, per-channel interpolation: the standard resize every
    * image-preprocessing pipeline applies before feature extraction.
    * Pure deterministic math, no library.
    */
  def resizePixels(px: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0, "dimensions must be positive")
    require(px.length == w * h, s"expected $w x $h = ${w * h} pixels, got ${px.length}")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y + 0.5) * h / th - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(sy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val fy = math.max(0.0, math.min(1.0, sy - y0))
      var x = 0
      while (x < tw) {
        val sx = (x + 0.5) * w / tw - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(sx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val fx = math.max(0.0, math.min(1.0, sx - x0))
        val p00 = px(y0 * w + x0); val p01 = px(y0 * w + x1)
        val p10 = px(y1 * w + x0); val p11 = px(y1 * w + x1)
        def ch(shift: Int): Int = {
          val c00 = (p00 >> shift) & 0xff; val c01 = (p01 >> shift) & 0xff
          val c10 = (p10 >> shift) & 0xff; val c11 = (p11 >> shift) & 0xff
          val top = c00 + (c01 - c00) * fx
          val bot = c10 + (c11 - c10) * fx
          math.round(top + (bot - top) * fy).toInt
        }
        out(y * tw + x) = (ch(16) << 16) | (ch(8) << 8) | ch(0)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Aspect-preserving target dimensions for a maxSide bound — the same
    * formula [[resizeMeta]] publishes as metadata, shared so the pixel
    * path and the metadata path can never disagree.
    */
  def targetDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (math.max(w, h) <= maxSide) (w, h)
    else {
      // Long math + floor-to-1: w * maxSide overflows Int for decodable
      // ~2^28-pixel-wide images, and an extreme aspect (200x1, maxSide 64)
      // truncates the short side to 0 — either would make resizePixels
      // throw inside mapPartitions and break the output-stays-total
      // contract for a VALID image.
      val m = math.max(w, h).toLong
      (math.max(1L, w.toLong * maxSide / m).toInt,
        math.max(1L, h.toLong * maxSide / m).toInt)
    }

  case class ResizedFeatures(
      media_id: Long,
      target_width: Int,
      target_height: Int,
      feature: Array[Double])

  /** Decode + REAL bilinear resize + feature-extract: the full
    * image-preprocessing chain the brief names (decode / resize /
    * feature). Images decode through the same dispatch as [[decode]]
    * (hand decoders, then ImageIO; corrupt PNGs terminal), resample to
    * `maxSide` preserving aspect, and emit the luminance histogram of
    * the RESIZED pixels — scale-normalized features, the point of
    * resizing before extraction. Undecodable payloads fall back to the
    * stub histogram with target dims (0, 0), so the output stays total.
    * Per-row mapPartitions, no shuffle.
    */
  def decodeResized(df: Dataset[MediaRow], maxSide: Int): Dataset[ResizedFeatures] = {
    implicit val enc = Encoders.product[ResizedFeatures]
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded: Option[(Int, Int, Array[Int])] = decodeBmpPixels(r.bytes) match {
          case some @ Some(_) => some
          case None =>
            decodePngDetailed(r.bytes) match {
              case PngOk(w, h, px) => Some((w, h, px))
              case PngCorrupt => None // terminal — same contract as decode()
              case PngUnsupported => decodeImageIOPixels(r.bytes)
            }
        }
        decoded match {
          case Some((w, h, px)) =>
            val (tw, th) = targetDims(w, h, maxSide)
            ResizedFeatures(r.media_id, tw, th, lumaHistogram(resizePixels(px, w, h, tw, th)))
          case None =>
            ResizedFeatures(r.media_id, 0, 0, nibbleHistogram(r.bytes))
        }
      }
    }
  }

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio (same formula as [[targetDims]], including its Long math and
    * floor-to-1 — a metadata row must never disagree with what the pixel
    * path [[decodeResized]] actually produces for the same media_id).
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    // mirror of targetDims in Column space: LONG multiply (an Int multiply
    // wraps for ~2^28-wide dims), a floor at 1 (extreme aspect would
    // truncate the short side to 0), and INTEGRAL division — Column `/`
    // divides in double, which disagrees with targetDims' exact Long
    // division once side*maxSide exceeds 2^53 (review-constructed
    // counterexample: (542029245, 1566774104, maxSide 58339123) rounds up
    // in double); IntegralDivide is the Long `div` the scalar path uses
    def dim(side: Column): Column = {
      import org.apache.spark.sql.graftshim.ColumnBridge
      val m = greatest(col("width"), col("height")).cast("long")
      val q = ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          ColumnBridge.expression(side.cast("long") * maxSide),
          ColumnBridge.expression(m)))
      when(greatest(col("width"), col("height")) <= maxSide, side)
        .otherwise(greatest(lit(1L), q).cast("int"))
    }
    df.select(
      col("media_id"),
      col("width"),
      col("height"),
      dim(col("width")).as("target_width"),
      dim(col("height")).as("target_height"))
  }

  // -------------------------------------------------------------------
  // Perceptual image hashing (dHash — difference hash over a downsampled
  // luma grid; the LAION/img2dataset-style near-dup key). Public
  // knowledge: the dHash construction is the widely-published
  // gradient-hash (Krawetz, hackerfactor 2013-class blog literature);
  // nothing here decodes beyond the existing format decoders above.
  // -------------------------------------------------------------------

  case class ImagePayload(media_id: Long, bytes: Array[Byte])

  /** Encode row-major top-down packed 0xRRGGBB pixels as an uncompressed
    * 24-bit BI_RGB Windows BMP — the exact inverse of
    * [[decodeBmpPixels]] (bottom-up row storage, 4-byte row padding),
    * pinned by a roundtrip test in MediaSpec. Payload-synthesis tool for
    * the multimodal fixtures (the WAV/MP3 encoders' image sibling).
    */
  def encodeBmp24(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h, "w*h must match px")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def p32(i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    p32(2, size); p32(10, 54); p32(14, 40); p32(18, w); p32(22, h)
    b(26) = 1; b(28) = 24 // planes = 1, bpp = 24; compression stays 0
    p32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        val i = base + x * 3 // stored B, G, R
        b(i) = (v & 0xff).toByte
        b(i + 1) = ((v >> 8) & 0xff).toByte
        b(i + 2) = ((v >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Integer luma of a packed 0xRRGGBB pixel — the ITU-R BT.601 weights
    * in exact integer arithmetic ((299R + 587G + 114B) / 1000, floor).
    * Gray pixels (R = G = B = v) map to exactly v, which is what lets
    * the x60 oracle restate the hash from the generator's closed form.
    */
  def lumaOf(p: Int): Int =
    (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000

  /** 64-bit dHash: resample to a 9x8 grid ([[resizePixels]] — identity
    * when the input already is 9x8), take per-cell luma, then one bit per
    * horizontally-adjacent comparison: bit (y*8 + x) = 1 iff
    * luma(x+1, y) > luma(x, y). Near-identical images differ in few
    * bits; hamming distance is the dedup distance.
    */
  def dHash64(w: Int, h: Int, px: Array[Int]): Long = {
    val g = if (w == 9 && h == 8) px else resizePixels(px, w, h, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lumaOf(g(y * 9 + x + 1)) > lumaOf(g(y * 9 + x)))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  case class PerceptualHash(media_id: Long, decoded: Boolean, phash: Long)

  /** Per-image perceptual hash over decoded pixels: BMP first (cheap
    * byte math), then PNG, then the ImageIO registry — the same decode
    * ladder as [[decodeResized]]. Undecodable payloads emit
    * decoded = false with phash 0 so the output stays total (callers
    * filter on the flag before pairing). mapPartitions, no shuffle.
    */
  def perceptualHashes(df: Dataset[ImagePayload]): Dataset[PerceptualHash] = {
    implicit val enc = Encoders.product[PerceptualHash]
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = decodeBmpPixels(r.bytes) match {
          case s @ Some(_) => s
          case None =>
            decodePngDetailed(r.bytes) match {
              case PngOk(w, h, px) => Some((w, h, px))
              case _ => decodeImageIOPixels(r.bytes)
            }
        }
        decoded match {
          case Some((w, h, px)) => PerceptualHash(r.media_id, decoded = true, dHash64(w, h, px))
          case None => PerceptualHash(r.media_id, decoded = false, 0L)
        }
      }
    }
  }
}
