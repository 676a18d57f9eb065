package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, udf}

/** Multimodal columns for large-scale training-data pipelines: media
  * payloads travel as opaque `binary` columns with TYPED metadata
  * extracted next to them — the Spark-native pattern for the image/
  * audio/video side of a 100 TB corpus (decode happens inside per-row
  * kernels; pixels never become first-class rows unless exploded
  * deliberately).
  *
  * Container metadata (format, dimensions) is parsed directly from magic
  * headers — no codec involved, scale-cheap. Full pixel decode uses the
  * JDK's ImageIO (PNG/JPEG/GIF/BMP). Audio is real for WAV/PCM
  * ([[audioMeta]]/[[audioStats]] — container + raw samples, no codec
  * needed); frame sampling is real for multi-frame GIF
  * ([[gifFrameStats]] via ImageIO) and for COMPRESSED video in the
  * MJPEG-AVI family ([[aviMjpegFrames]]: RIFF container walk + per-
  * frame baseline-JPEG decode — the one AV codec the stock JVM
  * decodes); MP4/ISO-BMFF container metadata (brand, duration, track
  * dims) is real via [[mp4Meta]]'s atom walk. Only frame DECODE of
  * codecs the JVM lacks (mp3/h264/vp9…) remains behind
  * [[avFrameSample]], an explicitly documented deterministic STUB that
  * preserves the real plumbing (schema, batching, partition behavior)
  * so a codec can be dropped in.
  */
object Multimodal {

  final case class ImageMeta(format: String, width: Int, height: Int)

  /** Parse container headers for dimensions: PNG IHDR, GIF logical
    * screen, BMP info header, JPEG SOFn scan, WebP VP8/VP8L/VP8X.
    * Pure function over the first bytes; returns null for non-images.
    */
  def imageMetaOf(d: Array[Byte]): ImageMeta = {
    @inline def u8(i: Int) = d(i) & 0xff
    @inline def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int) = (be16(i).toLong << 16 | be16(i + 2)).toInt
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = (le16(i).toLong | (le16(i + 2).toLong << 16)).toInt
    if (d == null || d.length < 16) return null
    // PNG: 89 50 4E 47 0D 0A 1A 0A + IHDR at 16
    if (u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' && d.length >= 24)
      return ImageMeta("png", be32(16), be32(20))
    // GIF87a/89a: LE logical screen size at 6
    if (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
      return ImageMeta("gif", le16(6), le16(8))
    // BMP: BM, info header at 14 (BITMAPINFOHEADER)
    if (u8(0) == 'B' && u8(1) == 'M' && d.length >= 26)
      return ImageMeta("bmp", le32(18), math.abs(le32(22)))
    // WebP: RIFF....WEBP
    if (u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        d.length >= 30 && u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' && u8(11) == 'P') {
      val fourcc = new String(d, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
      fourcc match {
        case "VP8 " => return ImageMeta("webp", le16(26) & 0x3fff, le16(28) & 0x3fff)
        case "VP8L" => // 14-bit packed minus-one dims after signature byte
          val b = (0 to 3).map(i => u8(21 + i))
          val w = 1 + (((b(1) & 0x3f) << 8) | b(0))
          val h = 1 + (((b(3) & 0x0f) << 10) | (b(2) << 2) | ((b(1) & 0xc0) >> 6))
          return ImageMeta("webp", w, h)
        case "VP8X" =>
          val w = 1 + (u8(24) | (u8(25) << 8) | (u8(26) << 16))
          val h = 1 + (u8(27) | (u8(28) << 8) | (u8(29) << 16))
          return ImageMeta("webp", w, h)
        case _ => return null
      }
    }
    // JPEG: scan markers for SOF0-SOF15 (except DHT/DAC/RST)
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < d.length) {
        if (u8(i) != 0xff) return null
        val marker = u8(i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0x01) i += 2
        else {
          val len = be16(i + 2)
          if (len < 2) return null
          if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 &&
              marker != 0xc8 && marker != 0xcc)
            return ImageMeta("jpeg", be16(i + 7), be16(i + 5))
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  /** image_meta(binary) -> struct<format,width,height> (null if not an
    * image container we recognize).
    */
  val imageMeta: Column => Column = {
    val f = udf((d: Array[Byte]) => Option(imageMetaOf(d)))
    c => f(c)
  }

  /** Normalized byte histogram as a fixed-length feature vector — a real
    * deterministic binary-content feature (useful for format clustering /
    * corruption detection); the shape all per-item feature extraction
    * takes at scale: binary in, fixed array<double> out.
    */
  def byteHistogram(data: Column, bins: Int = 16): Column = {
    val f = udf((d: Array[Byte], nb: Int) => {
      if (d == null || d.isEmpty) new Array[Double](nb)
      else {
        val h = new Array[Double](nb)
        val w = 256 / nb
        d.foreach(b => h((b & 0xff) / w) += 1.0)
        h.map(x => math.rint(x / d.length * 1e6) / 1e6)
      }
    })
    f(data, lit(bins))
  }

  /** Full pixel decode + mean RGB via the JDK's ImageIO. Returns
    * (width, height, meanR, meanG, meanB) or null when undecodable —
    * decode failures must not fail tasks.
    */
  final case class PixelStats(width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  val pixelStats: Column => Column = {
    val f = udf((d: Array[Byte]) => {
      if (d == null) None
      else
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
          if (img == null) None
          else {
            var (r, g, b) = (0L, 0L, 0L)
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Some(PixelStats(w, h,
              math.rint(r * 100.0 / n) / 100, math.rint(g * 100.0 / n) / 100,
              math.rint(b * 100.0 / n) / 100))
          }
        } catch { case _: Throwable => None }
    })
    c => f(c)
  }

  // — audio (WAV/RIFF is pure container + PCM: fully decodable with no
  //   codec — the real audio path; compressed codecs go through the
  //   avFrameSample stub below until a codec lands on the classpath) —

  final case class AudioMeta(format: String, channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Long, durationS: Double)

  /** Parse a RIFF/WAVE container: fmt chunk (channels, rate, bits) +
    * data chunk length -> frame count and duration. Chunk-walk, not
    * fixed offsets (LIST/fact chunks may precede fmt/data). Null for
    * anything that isn't a well-formed PCM WAV.
    */
  def audioMetaOf(d: Array[Byte]): AudioMeta = {
    if (d == null || d.length < 44) return null
    @inline def u8(i: Int) = d(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | ((u8(i + 3) & 0xffL) << 24)
    def fourcc(i: Int) = new String(d, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return null
    var pos = 12
    var channels, rate, bits, blockAlign = -1
    var dataLen = -1L
    while (pos + 8 <= d.length && (channels < 0 || dataLen < 0)) {
      val id = fourcc(pos)
      val len = le32(pos + 4)
      if (id == "fmt " && pos + 24 <= d.length) {
        val audioFormat = le16(pos + 8)
        // PCM (1) or IEEE float (3) or extensible (0xfffe)
        if (audioFormat != 1 && audioFormat != 3 && audioFormat != 0xfffe) return null
        channels = le16(pos + 10)
        rate = le32(pos + 12).toInt
        blockAlign = le16(pos + 20)
        bits = le16(pos + 22)
      } else if (id == "data") {
        dataLen = math.min(len, (d.length - pos - 8).toLong)
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      if (len < 0 || len > Int.MaxValue - 16) return null
    }
    if (channels <= 0 || rate <= 0 || blockAlign <= 0 || dataLen < 0) return null
    val nFrames = dataLen / blockAlign
    AudioMeta("wav", channels, rate, bits, nFrames,
      math.rint(nFrames.toDouble / rate * 1e6) / 1e6)
  }

  /** audio_meta(binary) -> struct<format,channels,sample_rate,
    * bits_per_sample,n_frames,duration_s> (null if not WAV).
    */
  val audioMeta: Column => Column = {
    val f = udf((d: Array[Byte]) => Option(audioMetaOf(d)))
    c => f(c)
  }

  final case class AudioStats(peak: Int, rms: Double, meanAbs: Double)

  /** 16-bit PCM sample statistics over all channels: peak |amplitude|,
    * RMS, mean |amplitude|. The feature-extraction shape for audio
    * quality filtering (silence / clipping detection) at corpus scale.
    * Null for non-WAV or non-16-bit payloads.
    */
  /** Locate the `data` chunk of a RIFF/WAVE payload: (offset, clipped
    * length) or null — the shared re-walk of [[audioStatsOf]] and
    * [[audioWindowsOf]] (cheap: headers are tiny; validation already
    * happened in [[audioMetaOf]]).
    */
  private def wavDataChunk(d: Array[Byte]): (Int, Long) = {
    @inline def u8(i: Int) = d(i) & 0xff
    def fourcc(i: Int) = new String(d, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    @inline def le32(i: Int) = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | ((u8(i + 3) & 0xffL) << 24)
    var pos = 12
    while (pos + 8 <= d.length) {
      val id = fourcc(pos)
      val len = le32(pos + 4)
      if (id == "data")
        return (pos + 8, math.min(len, (d.length - pos - 8).toLong))
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    null
  }

  def audioStatsOf(d: Array[Byte]): AudioStats = {
    val meta = audioMetaOf(d)
    if (meta == null || meta.bitsPerSample != 16) return null
    @inline def u8(i: Int) = d(i) & 0xff
    val chunk = wavDataChunk(d)
    if (chunk == null) return null
    val (dataOff, dataLen) = chunk
    val n = (dataLen / 2).toInt
    if (n == 0) return AudioStats(0, 0.0, 0.0)
    var peak = 0
    var sumSq = 0.0
    var sumAbs = 0.0
    var i = 0
    while (i < n) {
      val s = ((d(dataOff + 2 * i + 1) << 8) | u8(dataOff + 2 * i)).toShort.toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toDouble * s
      sumAbs += a
      i += 1
    }
    AudioStats(peak, math.rint(math.sqrt(sumSq / n) * 1e6) / 1e6,
      math.rint(sumAbs / n * 1e6) / 1e6)
  }

  /** audio_stats(binary) -> struct<peak,rms,mean_abs> for 16-bit PCM. */
  val audioStats: Column => Column = {
    val f = udf((d: Array[Byte]) => Option(audioStatsOf(d)))
    c => f(c)
  }

  final case class AudioWindow(windowIndex: Int, nFrames: Int, peak: Double,
      rms: Double, zcr: Double)

  /** Windowed 16-bit PCM features over the channel mixdown: for each
    * window of `windowFrames` frames, peak |amplitude|, RMS, and
    * zero-crossing rate (strict sign flips between consecutive frames
    * WITHIN the window, over the window's frame count — so windows are
    * independent and the boundary pair is never double-counted). This is
    * the per-document audio feature matrix for corpus filtering
    * (silence / clipping / tone-vs-speech heuristics): each payload
    * expands to O(duration / window) rows with no shuffle, and a later
    * aggregate over windows distributes like any tall table. The final
    * window may be short; null (not an empty array) for non-WAV or
    * non-16-bit payloads.
    */
  def audioWindowsOf(d: Array[Byte], windowFrames: Int): Seq[AudioWindow] = {
    val meta = audioMetaOf(d)
    if (meta == null || meta.bitsPerSample != 16 || windowFrames <= 0) return null
    @inline def u8(i: Int) = d(i) & 0xff
    val chunk = wavDataChunk(d)
    if (chunk == null) return null
    val (dataOff, dataLen) = chunk
    val ch = meta.channels
    val nFrames = (dataLen / 2 / ch).toInt
    @inline def mix(t: Int): Double = {
      var c = 0
      var s = 0.0
      while (c < ch) {
        val i = dataOff + 2 * (t * ch + c)
        s += ((d(i + 1) << 8) | u8(i)).toShort.toInt
        c += 1
      }
      s / ch
    }
    val out = Seq.newBuilder[AudioWindow]
    var w = 0
    var start = 0
    while (start < nFrames) {
      val end = math.min(start + windowFrames, nFrames)
      var peak = 0.0
      var sumSq = 0.0
      var crossings = 0
      var prev = 0.0
      var t = start
      while (t < end) {
        val v = mix(t)
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v * v
        if (t > start && prev * v < 0) crossings += 1
        prev = v
        t += 1
      }
      val n = end - start
      out += AudioWindow(w, n,
        math.rint(peak * 1e6) / 1e6,
        math.rint(math.sqrt(sumSq / n) * 1e6) / 1e6,
        math.rint(crossings.toDouble / n * 1e6) / 1e6)
      w += 1
      start = end
    }
    out.result()
  }

  /** audio_windows(binary, n) -> array<struct<windowIndex,nFrames,peak,
    * rms,zcr>> of windowed PCM features (null for non-16-bit-WAV).
    */
  def audioWindows(data: Column, windowFrames: Int): Column = {
    val f = udf((d: Array[Byte], w: Int) => Option(audioWindowsOf(d, w)))
    f(data, lit(windowFrames))
  }

  /** 64-bit audio near-dup fingerprint: sign-of-delta over the windowed
    * RMS envelope of the channel mixdown — bit i set when
    * rms[i+1] > rms[i] across the first 65 windows (the dHash idea
    * applied to the loudness envelope, so the code survives
    * gain-preserving re-encodes that keep the envelope SHAPE). Needs at
    * least 65 windows; null otherwise, and null for non-16-bit-WAV
    * payloads. Packed as two 32-bit halves (the e19/m09 sign-code
    * doctrine). Searchable by hamming distance exactly like the image
    * dHash — m09 and m10 share one banded pair pipeline.
    */
  def audioFingerprintOf(d: Array[Byte], windowFrames: Int): DHash = {
    val ws = audioWindowsOf(d, windowFrames)
    if (ws == null || ws.length < 65) return null
    var h0 = 0L
    var h1 = 0L
    var i = 0
    while (i < 64) {
      if (ws(i + 1).rms > ws(i).rms) {
        if (i < 32) h0 |= 1L << i else h1 |= 1L << (i - 32)
      }
      i += 1
    }
    DHash(h0, h1)
  }

  /** audio_fingerprint(binary, windowFrames) -> struct<h0,h1> (null-safe). */
  def audioFingerprint(data: Column, windowFrames: Int): Column = {
    val f = udf((d: Array[Byte], w: Int) => Option(audioFingerprintOf(d, w)))
    f(data, lit(windowFrames))
  }

  // — video-ish frame sampling: multi-frame GIF decodes with ImageIO
  //   alone (no external codec), so animated GIF is the REAL sampled-
  //   decode path; other containers still go through the stub below —

  final case class FrameStat(frameIndex: Int, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Decode a multi-frame GIF and return per-frame pixel stats for up to
    * `n` evenly spaced frames (indices floor(total*i/n)). The real
    * frame-sampling kernel: container in, k decoded frames' features
    * out, partition-parallel, failures -> null (never task errors).
    */
  def gifFrameStatsOf(d: Array[Byte], n: Int): Seq[FrameStat] = {
    if (d == null || d.length < 6 || !(d(0) == 'G' && d(1) == 'I' && d(2) == 'F')) return null
    var stream: javax.imageio.stream.ImageInputStream = null
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return null
    val reader = readers.next()
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(d))
      reader.setInput(stream, false, true)
      val total = reader.getNumImages(true)
      if (total <= 0) return null
      val picks = evenPicks(total, n)
      picks.map { idx =>
        val img = reader.read(idx)
        var (r, g, b) = (0L, 0L, 0L)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        FrameStat(idx, w, h,
          math.rint(r * 100.0 / np) / 100, math.rint(g * 100.0 / np) / 100,
          math.rint(b * 100.0 / np) / 100)
      }
    } catch { case _: Throwable => null } finally {
      reader.dispose()
      if (stream != null) stream.close()
    }
  }

  /** frame_sample(binary, n) -> array<struct<frame_index,width,height,
    * mean_r,mean_g,mean_b>> over a multi-frame GIF.
    */
  def gifFrameStats(data: Column, nFrames: Int = 4): Column = {
    val f = udf((d: Array[Byte], n: Int) => Option(gifFrameStatsOf(d, n)))
    f(data, lit(nFrames))
  }

  final case class AviFrameStat(frameIndex: Int, offset: Long, width: Int,
      height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** The `##dc`/`##db` stream-0 video chunks of an MJPEG AVI as
    * (offset, size) pairs — the shared RIFF walk (LIST chunks
    * recursively, so frames inside `movi`/`rec ` lists are all found)
    * of [[aviMjpegFramesOf]] and [[aviFrameDhashesOf]]. Null for
    * non-AVI bytes or a container with no video chunks.
    */
  private def aviVideoChunks(d: Array[Byte]): Seq[(Long, Int)] = {
    if (d == null || d.length < 12) return null
    @inline def u8(i: Int) = d(i) & 0xff
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def fourcc(i: Int) = new String(d, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    try {
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)] // (offset, size)
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(p)
          val size = le32(p + 4)
          val dataStart = p + 8
          if (size < 0 || dataStart + size > to) return // corrupt length: stop
          if (id == "LIST") {
            if (size >= 4) walk(dataStart + 4, dataStart + size)
          } else if (id.length == 4 && id(0) == '0' && id(1) == '0' &&
              id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')) {
            frames += ((dataStart.toLong, size))
          }
          p = dataStart + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, math.min(12L + le32(4) - 4, d.length.toLong).toInt)
      if (frames.isEmpty) null else frames.toSeq
    } catch { case _: Throwable => null }
  }

  /** Evenly spaced sample of `total` items, the shared rule of all the
    * frame samplers (GIF, MJPEG stats, MJPEG dHash): all when <= n —
    * explicit, because total·i/n collapses to duplicate picks when
    * 1 < total < n — else stride total/n.
    */
  private def evenPicks(total: Int, n: Int): Seq[Int] =
    if (total <= n) 0 until total
    else (0 until n).map(i => (total.toLong * i / n).toInt)

  /** COMPRESSED-AV frame sampling for MJPEG-in-AVI — the one AV codec
    * family the stock JVM really decodes (each frame is a baseline
    * JPEG, ImageIO's native reader). Collects the video chunks via
    * [[aviVideoChunks]] and decodes up to `n` evenly spaced frames to
    * pixel stats — the same sampled-decode contract as
    * [[gifFrameStatsOf]], plus the byte offset of each sampled frame
    * inside the container (the point-lookup handle a 100 TB media
    * pipeline stores instead of pixels). Corrupt containers or
    * frames -> null, never a task failure.
    */
  def aviMjpegFramesOf(d: Array[Byte], n: Int): Seq[AviFrameStat] = {
    val frames = aviVideoChunks(d)
    if (frames == null) return null
    try {
      // plain loop: a `return` from inside map's closure would throw
      // NonLocalReturnControl into the catch-all (see aviFrameDhashesOf)
      val picks = evenPicks(frames.length, n)
      val out = Seq.newBuilder[AviFrameStat]
      var k = 0
      while (k < picks.length) {
        val idx = picks(k)
        val (off, len) = frames(idx)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(d, off.toInt, len))
        if (img == null) return null
        var (r, g, b) = (0L, 0L, 0L)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        out += AviFrameStat(idx, off, w, h,
          math.rint(r * 100.0 / np) / 100, math.rint(g * 100.0 / np) / 100,
          math.rint(b * 100.0 / np) / 100)
        k += 1
      }
      out.result()
    } catch { case _: Throwable => null }
  }

  /** mjpeg_frame_sample(binary, n) -> array<struct<frame_index,offset,
    * width,height,mean_r,mean_g,mean_b>> over an MJPEG AVI.
    */
  def aviMjpegFrames(data: Column, nFrames: Int = 4): Column = {
    val f = udf((d: Array[Byte], n: Int) => Option(aviMjpegFramesOf(d, n)))
    f(data, lit(nFrames))
  }

  final case class FrameHash(frameIndex: Int, h0: Long, h1: Long)

  /** Per-sampled-frame perceptual dHash over an MJPEG AVI — the VIDEO
    * near-dup fingerprint: up to n evenly spaced frames, each decoded
    * (real baseline-JPEG decode) and hashed by [[jpegDhashOf]]'s
    * 9×8 luma-grid rule; frameIndex is the SAMPLE position (0..n-1) so
    * fingerprints of different clips align position-by-position. Null
    * for non-AVI containers or any undecodable sampled frame.
    */
  def aviFrameDhashesOf(d: Array[Byte], n: Int): Seq[FrameHash] = {
    val frames = aviVideoChunks(d)
    if (frames == null) return null
    try {
      // plain loop, no early return inside a closure: a `return` from a
      // lambda throws NonLocalReturnControl, which the catch-all below
      // would swallow — correct by coincidence and fragile under any
      // future catch narrowing
      val picks = evenPicks(frames.length, n)
      val out = Seq.newBuilder[FrameHash]
      var k = 0
      while (k < picks.length) {
        val (off, len) = frames(picks(k))
        val h = jpegDhashOf(
          java.util.Arrays.copyOfRange(d, off.toInt, off.toInt + len))
        if (h == null) return null // undecodable sampled frame: whole clip is null
        out += FrameHash(k, h.h0, h.h1)
        k += 1
      }
      out.result()
    } catch { case _: Throwable => null }
  }

  /** mjpeg_frame_dhash(binary, n) -> array<struct<frameIndex,h0,h1>>. */
  def aviFrameDhashes(data: Column, nFrames: Int = 4): Column = {
    val f = udf((d: Array[Byte], n: Int) => Option(aviFrameDhashesOf(d, n)))
    f(data, lit(nFrames))
  }

  final case class PixelSample(x: Int, y: Int, r: Int, g: Int, b: Int)

  /** Decode a JPEG (ImageIO's native baseline decoder) and sample an
    * n×n grid of pixels at the deterministic positions
    * x_i = floor((w-1)·i/(n-1)), same for y — the fixed-budget pixel
    * probe a media pipeline stores per image instead of the bitmap
    * (perceptual-hash seeds, solid-color/letterbox detection). Row
    * order is (y, x) raster order. Null for undecodable bytes, never a
    * task failure.
    */
  def jpegPixelGridOf(d: Array[Byte], n: Int): Seq[PixelSample] = {
    if (d == null || d.length < 4 ||
        (d(0) & 0xff) != 0xFF || (d(1) & 0xff) != 0xD8) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
      if (img == null) return null
      val w = img.getWidth
      val h = img.getHeight
      def pos(i: Int, extent: Int): Int =
        if (n == 1) 0 else ((extent - 1).toLong * i / (n - 1)).toInt
      // single-band (grayscale) images: read the RAW sample — getRGB
      // would push it through the linear-gray -> sRGB color transform
      // (128 comes back 188), destroying the decoder's exact values
      val gray = img.getRaster.getNumBands == 1
      for { j <- 0 until n; i <- 0 until n } yield {
        val x = pos(i, w)
        val y = pos(j, h)
        if (gray) {
          val v = img.getRaster.getSample(x, y, 0)
          PixelSample(x, y, v, v, v)
        } else {
          val p = img.getRGB(x, y)
          PixelSample(x, y, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        }
      }
    } catch { case _: Throwable => null }
  }

  final case class DHash(h0: Long, h1: Long)

  /** Perceptual difference hash (dHash, 64-bit) of a JPEG: sample a
    * 9-column × 8-row luma grid at x_i = floor((w-1)·i/8),
    * y_j = floor((h-1)·j/7) (the [[jpegPixelGridOf]] position rule),
    * set bit (j·8+i) when luma[j][i] > luma[j][i+1]. This is the
    * standard image near-dup fingerprint: 8 bytes per image, robust to
    * re-encode/resize, searchable by hamming distance. Packed as two
    * 32-bit halves so neither engine touches the BIGINT sign bit (the
    * e19 sign-code doctrine). Gray images read the raw band (exact
    * decoder values); RGB uses integer ITU-R 601 luma. Null for
    * undecodable bytes, never a task failure.
    */
  def jpegDhashOf(d: Array[Byte]): DHash = {
    if (d == null || d.length < 4 ||
        (d(0) & 0xff) != 0xFF || (d(1) & 0xff) != 0xD8) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
      if (img == null) return null
      dhashOfDecoded(img)
    } catch { case _: Throwable => null }
  }

  /** The dHash grid/luma/bit-pack core over an already-decoded image —
    * shared by [[jpegDhashOf]] and [[imageDhashOf]] so every container
    * format hashes identical PIXELS to the identical CODE (the property
    * m13's cross-format dedup rides on). Single-band rasters read raw
    * samples ONLY when the color model is not palette-indexed: a GIF's
    * one band holds palette indices, which must go through getRGB.
    */
  private def dhashOfDecoded(img: java.awt.image.BufferedImage): DHash = {
    val w = img.getWidth
    val h = img.getHeight
    val gray = img.getRaster.getNumBands == 1 &&
      !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    def luma(x: Int, y: Int): Int =
      if (gray) img.getRaster.getSample(x, y, 0)
      else {
        val p = img.getRGB(x, y)
        (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
      }
    var h0 = 0L
    var h1 = 0L
    var j = 0
    while (j < 8) {
      val y = ((h - 1).toLong * j / 7).toInt
      var prev = luma(0, y)
      var i = 0
      while (i < 8) {
        val nxt = luma(((w - 1).toLong * (i + 1) / 8).toInt, y)
        if (prev > nxt) {
          val b = j * 8 + i
          if (b < 32) h0 |= 1L << b else h1 |= 1L << (b - 32)
        }
        prev = nxt
        i += 1
      }
      j += 1
    }
    DHash(h0, h1)
  }

  /** Format-agnostic [[jpegDhashOf]]: PNG/GIF/BMP/JPEG through the one
    * dHash core, so a mixed-format corpus dedups TOGETHER — a PNG
    * re-save of a JPEG's pixels lands at hamming 0 from the original.
    * The magic-byte sniff ([[imageMetaOf]]) gates before ImageIO so
    * arbitrary binary never reaches a decoder probe loop; WebP has no
    * JDK ImageIO reader and returns null (disclosed, like avFrameSample).
    */
  def imageDhashOf(d: Array[Byte]): DHash = {
    val meta = imageMetaOf(d)
    if (meta == null || meta.format == "webp") return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
      if (img == null) return null
      dhashOfDecoded(img)
    } catch { case _: Throwable => null }
  }

  /** jpeg_dhash(binary) -> struct<h0 bigint, h1 bigint> (null-safe). */
  def jpegDhash(data: Column): Column = {
    val f = udf((d: Array[Byte]) => Option(jpegDhashOf(d)))
    f(data)
  }

  /** image_dhash(binary) -> struct<h0 bigint, h1 bigint> (null-safe),
    * any ImageIO-decodable container.
    */
  def imageDhash(data: Column): Column = {
    val f = udf((d: Array[Byte]) => Option(imageDhashOf(d)))
    f(data)
  }

  final case class ResizedPixel(x: Int, y: Int, gray: Double)

  /** Box-filter image RESIZE to `ow`×`oh` grayscale — the thumbnail /
    * model-input-normalization step of a multimodal pipeline, done as
    * exact area averaging: output cell (x, y) averages the luma of the
    * source rectangle [x·w/ow, (x+1)·w/ow) × [y·h/oh, (y+1)·h/oh)
    * (integer boundaries, so cells partition the image exactly and the
    * result is derivable on paper for block-flat fixtures). Gray
    * images read the raw band; RGB uses integer ITU-R 601 luma (the
    * [[jpegDhashOf]] rule). Values rounded to 6 dp. Null for
    * undecodable bytes, never a task failure.
    */
  def imageResizeOf(d: Array[Byte], ow: Int, oh: Int): Seq[ResizedPixel] = {
    if (d == null || d.length < 4 || ow <= 0 || oh <= 0) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
      if (img == null) return null
      val w = img.getWidth
      val h = img.getHeight
      if (w < ow || h < oh) return null
      val gray = img.getRaster.getNumBands == 1
      def luma(x: Int, y: Int): Int =
        if (gray) img.getRaster.getSample(x, y, 0)
        else {
          val p = img.getRGB(x, y)
          (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        }
      for (r <- 0 until oh; c <- 0 until ow) yield {
        val y0 = (h.toLong * r / oh).toInt
        val y1 = (h.toLong * (r + 1) / oh).toInt
        val x0 = (w.toLong * c / ow).toInt
        val x1 = (w.toLong * (c + 1) / ow).toInt
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(x, y); x += 1 }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        ResizedPixel(c, r, math.rint(s.toDouble / n * 1e6) / 1e6)
      }
    } catch { case _: Throwable => null }
  }

  /** image_resize(binary, ow, oh) -> array<struct<x,y,gray>> (null-safe). */
  def imageResize(data: Column, ow: Int, oh: Int): Column = {
    val f = udf((d: Array[Byte], a: Int, b: Int) => Option(imageResizeOf(d, a, b)))
    f(data, lit(ow), lit(oh))
  }

  /** jpeg_pixel_grid(binary, n) -> array<struct<x,y,r,g,b>>. */
  def jpegPixelGrid(data: Column, n: Int): Column = jpegPixelGrid(data, lit(n))

  /** Column-n variant (the SQL-surface registration form). */
  def jpegPixelGrid(data: Column, n: Column): Column = {
    val f = udf((d: Array[Byte], k: Int) => Option(jpegPixelGridOf(d, k)))
    f(data, n)
  }

  // — MP4 / ISO-BMFF container metadata: a pure box-header walk (ftyp
  //   brand, moov/mvhd timescale + duration, trak/tkhd track dims) —
  //   no codec involved, so duration and dimensions are REAL even though
  //   frame decode stays behind the stub below —

  final case class Mp4Meta(brand: String, timescale: Long, durationS: Double,
      nTracks: Int, width: Option[Int], height: Option[Int])

  /** Parse an ISO-BMFF (MP4/MOV/M4A…) container's metadata atoms:
    * `ftyp` major brand, `moov/mvhd` movie timescale + duration,
    * `moov/trak/tkhd` per-track dimensions (16.16 fixed point; the
    * first track with nonzero dims is the presentation video track —
    * audio tracks store 0x0). Handles 32- and 64-bit box sizes and
    * version 0/1 full boxes. Null for anything that isn't ISO-BMFF;
    * truncated boxes stop the walk, keeping whatever was parsed.
    */
  def mp4MetaOf(d: Array[Byte]): Mp4Meta = {
    if (d == null || d.length < 16) return null
    @inline def u8(i: Int) = d(i) & 0xff
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int) = new String(d, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // ISO-BMFF files begin with a box whose type is alphanumeric ASCII;
    // require the canonical ftyp signature to call it a container
    if (fourcc(4) != "ftyp") return null
    var brand: String = null
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var width, height: Option[Int] = None
    // walk one box level [lo, hi); `into` recurses for container boxes
    def walk(lo: Int, hi: Int, depth: Int): Unit = {
      var pos = lo
      while (pos + 8 <= hi && depth < 8) {
        val size0 = be32(pos)
        val typ = fourcc(pos + 4)
        // size 1 -> 64-bit largesize; size 0 -> box extends to end
        val (size, hdr) =
          if (size0 == 1L && pos + 16 <= hi) (be64(pos + 8), 16) else (size0, 8)
        val end =
          if (size == 0L) hi
          else if (size < hdr || pos + size > hi) return // truncated/corrupt
          else (pos + size).toInt
        typ match {
          case "ftyp" if pos + hdr + 4 <= end =>
            brand = fourcc(pos + hdr)
          case "moov" => walk(pos + hdr, end, depth + 1)
          case "trak" =>
            nTracks += 1
            walk(pos + hdr, end, depth + 1)
          case "mvhd" if pos + hdr + 4 <= end =>
            val v = u8(pos + hdr)
            if (v == 1 && pos + hdr + 32 <= end) {
              timescale = be32(pos + hdr + 20)
              duration = be64(pos + hdr + 24)
            } else if (v == 0 && pos + hdr + 20 <= end) {
              timescale = be32(pos + hdr + 12)
              duration = be32(pos + hdr + 16)
            }
          case "tkhd" if pos + hdr + 4 <= end =>
            val v = u8(pos + hdr)
            val dimOff = if (v == 1) pos + hdr + 88 else pos + hdr + 76
            if (dimOff + 8 <= end && width.isEmpty) {
              val w = (be32(dimOff) >> 16).toInt     // 16.16 fixed point
              val h = (be32(dimOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = Some(w); height = Some(h) }
            }
          case _ => // leaf box we don't need (mdat, free, udta, …)
        }
        pos = if (end <= pos) return else end
      }
    }
    walk(0, d.length, 0)
    if (brand == null) return null
    val durS =
      if (timescale > 0) math.rint(duration.toDouble / timescale * 1e6) / 1e6
      else 0.0
    Mp4Meta(brand, timescale, durS, nTracks, width, height)
  }

  /** mp4_meta(binary) -> struct<brand,timescale,duration_s,n_tracks,
    * width,height> (null if not an ISO-BMFF container).
    */
  val mp4Meta: Column => Column = {
    val f = udf((d: Array[Byte]) => Option(mp4MetaOf(d)))
    c => f(c)
  }

  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, nFrames: Long, durationS: Double,
      hasId3: Boolean)

  /** MPEG audio (MP3) metadata: skip an ID3v2 tag if present, then walk
    * the frame headers — 4-byte sync'd headers carrying version / layer
    * / bitrate index / samplerate index / padding, each giving the exact
    * frame length, so frame COUNT and duration come from pure container
    * arithmetic (frames * samplesPerFrame / rate), no codec. First
    * frame's header supplies the advertised bitrate/rate/mode; VBR
    * streams still count correctly because each frame is walked
    * individually. Null for anything without a valid first frame.
    * (Frame DECODE stays behind [[avFrameSample]] — the JVM has no
    * MP3 decoder.)
    */
  def mp3MetaOf(d: Array[Byte]): Mp3Meta = {
    if (d == null || d.length < 4) return null
    @inline def u8(i: Int) = d(i) & 0xff
    var pos = 0
    var hasId3 = false
    if (d.length >= 10 && d(0) == 'I' && d(1) == 'D' && d(2) == '3') {
      // ID3v2: 4-byte syncsafe length after the 6-byte header; the
      // size excludes the header AND the optional v2.4 footer
      // (flags bit 0x10), so a footer adds 10 more
      val sz = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      pos = 10 + sz + (if ((u8(5) & 0x10) != 0) 10 else 0)
      hasId3 = true
    }
    // bitrate kbps by [versionIdx][layerIdx][bitrateIdx]; 0 = free/bad
    val brV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val brV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    val srV1 = Array(44100, 48000, 32000, 0)
    var version: String = null
    var layer, bitrate, rate, channels = -1
    var nFrames = 0L
    var durUs = 0.0
    while (pos + 4 <= d.length) {
      if (u8(pos) != 0xff || (u8(pos + 1) & 0xe0) != 0xe0) {
        // lost sync: stop at the first non-frame byte (tag garbage /
        // truncation); what was counted so far stands
        pos = d.length
      } else {
        val b1 = u8(pos + 1); val b2 = u8(pos + 2); val b3 = u8(pos + 3)
        val verBits = (b1 >> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (b1 >> 1) & 3 // 1=Layer III
        val brIdx = (b2 >> 4) & 15
        val srIdx = (b2 >> 2) & 3
        val padding = (b2 >> 1) & 1
        if (verBits == 1 || layerBits != 1 || brIdx == 0 || brIdx == 15 ||
            srIdx == 3) {
          pos = d.length // only Layer III with a stated bitrate is walked
        } else {
          val v1 = verBits == 3
          val kbps = if (v1) brV1L3(brIdx) else brV2L3(brIdx)
          val sr0 = srV1(srIdx)
          val sr = if (v1) sr0 else if (verBits == 2) sr0 / 2 else sr0 / 4
          val samplesPerFrame = if (v1) 1152 else 576
          val frameLen = samplesPerFrame / 8 * kbps * 1000 / sr + padding
          if (version == null) {
            version = if (v1) "mpeg1" else if (verBits == 2) "mpeg2" else "mpeg2.5"
            layer = 3; bitrate = kbps; rate = sr
            channels = if (((b3 >> 6) & 3) == 3) 1 else 2
          }
          nFrames += 1
          durUs += samplesPerFrame.toDouble / sr * 1e6
          pos += frameLen
        }
      }
    }
    if (version == null) return null
    Mp3Meta(version, layer, bitrate, rate, channels, nFrames,
      math.rint(durUs) / 1e6, hasId3)
  }

  /** mp3_meta(binary) -> struct<version,layer,bitrate_kbps,sample_rate,
    * channels,n_frames,duration_s,has_id3> (null if not MPEG audio).
    */
  val mp3Meta: Column => Column = {
    val f = udf((d: Array[Byte]) => Option(mp3MetaOf(d)))
    c => f(c)
  }

  /** STUB — MP4-family ONLY (h264/vp9/aac inside ISO-BMFF/webm: the
    * codecs no stock JVM decodes). Every other media path is real and
    * oracle-gated: WAV PCM ([[audioStatsOf]], m02), multi-frame GIF
    * ([[gifFrameStatsOf]], m03), MJPEG-AVI ([[aviMjpegFramesOf]], m05),
    * baseline JPEG pixels ([[jpegPixelGridOf]], m07 — hand-derived
    * oracle), MP4 container metadata ([[mp4MetaOf]], m04). For the MP4
    * frame-decode gap this returns deterministic pseudo-frames
    * (byte slices at evenly spaced offsets) so the Spark-side plumbing —
    * schema array<struct<offset,bytes>>, per-row batching, partition
    * parallelism — is real and tested, and a codec-backed implementation
    * can replace the kernel without touching the pipeline.
    */
  def avFrameSample(data: Column, nFrames: Int = 4, frameBytes: Int = 64): Column = {
    val f = udf((d: Array[Byte], n: Int, fb: Int) => {
      if (d == null || d.isEmpty) Seq.empty[(Long, Array[Byte])]
      else (0 until n).map { i =>
        val off = (d.length.toLong * i / n).toInt
        (off.toLong, java.util.Arrays.copyOfRange(d, off, math.min(off + fb, d.length)))
      }
    })
    f(data, lit(nFrames), lit(frameBytes))
  }
}
