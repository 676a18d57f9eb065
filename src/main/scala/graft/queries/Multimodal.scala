package graft.queries

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary media payloads with typed metadata
  * (see graft.functions.Multimodal). Inputs are deterministic generated
  * images (lossless formats), so the decode pipeline's output is exact.
  */
object Multimodal {

  private def makeImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  /** Minimal PCM WAV builder (RIFF + fmt + data). */
  private[graft] def makeWav(channels: Int, rate: Int, bits: Int,
      samples: Array[Int]): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataLen = samples.length * bits / 8
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataLen); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1.toShort); out.putShort(channels.toShort)
    out.putInt(rate); out.putInt(rate * blockAlign)
    out.putShort(blockAlign.toShort); out.putShort(bits.toShort)
    out.put("data".getBytes); out.putInt(dataLen)
    samples.foreach { s =>
      if (bits == 16) out.putShort(s.toShort) else out.put(s.toByte)
    }
    out.array()
  }

  /** Animated (multi-frame) GIF via ImageIO's sequence writer. */
  private def makeAnimatedGif(w: Int, h: Int, frameColors: Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameColors.foreach { rgb =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** RIFF chunk: fourcc + LE size + payload (padded to even; size field
    * records the unpadded length, per the RIFF spec).
    */
  private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(data.length).put(data)
    out.array()
  }

  /** Minimal MJPEG AVI: RIFF(AVI ) > LIST(hdrl) > avih, LIST(movi) >
    * one 00dc chunk per frame, each a real ImageIO-encoded JPEG.
    */
  private[graft] def makeAvi(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h) // + 4 reserved ints of zero padding
    val hdrl = riffChunk("LIST",
      "hdrl".getBytes ++ riffChunk("avih", avih.array()))
    val movi = riffChunk("LIST",
      "movi".getBytes ++ frames.flatMap(f => riffChunk("00dc", f)))
    riffChunk("RIFF", "AVI ".getBytes ++ hdrl ++ movi)
  }

  /** ISO-BMFF box: 32-bit big-endian size + fourcc type + payload. */
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(len) // BE by default
    out.putInt(len).put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    payload.foreach(out.put)
    out.array()
  }

  private def beInts(xs: Int*): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * xs.length)
    xs.foreach(out.putInt)
    out.array()
  }

  /** mvhd full box payload (version 0 or 1). */
  private def mvhd(version: Int, timescale: Int, duration: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(if (version == 1) 112 else 100)
    out.putInt(version << 24) // version + zero flags
    if (version == 1) {
      out.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
    } else {
      out.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
    }
    out.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    out.put(new Array[Byte](10))                    // reserved
    out.put(beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)) // identity matrix
    out.put(new Array[Byte](24)).putInt(3)          // predefined, next track id
    out.array()
  }

  /** tkhd full box payload (version 0 or 1); dims in 16.16 fixed point. */
  private def tkhd(version: Int, trackId: Int, duration: Long,
      w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(if (version == 1) 96 else 84)
    out.putInt((version << 24) | 7) // flags: enabled | in_movie | in_preview
    if (version == 1) {
      out.putLong(0L).putLong(0L).putInt(trackId).putInt(0).putLong(duration)
    } else {
      out.putInt(0).putInt(0).putInt(trackId).putInt(0).putInt(duration.toInt)
    }
    out.putLong(0L)                        // reserved
    out.putShort(0).putShort(0)            // layer, alternate group
    out.putShort(0).putShort(0)            // volume, reserved
    out.put(beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
    out.putInt(w << 16).putInt(h << 16)
    out.array()
  }

  private def ftyp(brand: String): Array[Byte] =
    box("ftyp", brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      beInts(0), brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload -> header metadata + full pixel decode, including a
    // corrupt row that must yield nulls, never a task failure.
    "m01_image_meta" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = Seq(
        (1L, makeImage(31, 17, 0x406080, "png")),
        (2L, makeImage(12, 34, 0xff0000, "gif")),
        (3L, makeImage(8, 9, 0x102030, "bmp")),
        (4L, "corrupt media payload".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          M.imageMeta(col("payload")).getField("format").as("format"),
          M.imageMeta(col("payload")).getField("width").as("width"),
          M.imageMeta(col("payload")).getField("height").as("height"),
          M.pixelStats(col("payload")).getField("meanR").as("mean_r"),
          M.pixelStats(col("payload")).getField("meanG").as("mean_g"),
          M.pixelStats(col("payload")).getField("meanB").as("mean_b"))
        .orderBy(col("media_id"))
    }),

    // WAV/PCM audio: container metadata + sample statistics, no codec
    // (the REAL audio path — see functions.Multimodal). Square wave of
    // amplitude 8000 -> peak = rms = mean_abs = 8000 exactly; silence ->
    // zeros; an 8-bit file has metadata but no 16-bit stats; corrupt
    // bytes -> all nulls, never task failures.
    "m02_audio_meta" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val square = Array.tabulate(1600)(i => if ((i / 4) % 2 == 0) 8000 else -8000)
      val rows = Seq(
        (1L, makeWav(1, 8000, 16, square)),
        (2L, makeWav(2, 44100, 16, new Array[Int](882))), // 441 stereo frames of silence
        (3L, makeWav(1, 8000, 8, Array.fill(800)(128))),  // 8-bit: meta only
        (4L, "not audio at all".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          M.audioMeta(col("payload")).getField("format").as("format"),
          M.audioMeta(col("payload")).getField("channels").as("channels"),
          M.audioMeta(col("payload")).getField("sampleRate").as("sample_rate"),
          M.audioMeta(col("payload")).getField("bitsPerSample").as("bits"),
          M.audioMeta(col("payload")).getField("nFrames").as("n_frames"),
          M.audioMeta(col("payload")).getField("durationS").as("duration_s"),
          M.audioStats(col("payload")).getField("peak").as("peak"),
          M.audioStats(col("payload")).getField("rms").as("rms"),
          M.audioStats(col("payload")).getField("meanAbs").as("mean_abs"))
        .orderBy(col("media_id"))
    }),

    // Multi-frame GIF frame sampling: 6 solid-color frames, sample 3
    // evenly spaced (indices 0,2,4) and decode pixel stats per frame —
    // the real video-ish sampled-decode kernel. A single-frame GIF
    // samples its one frame; corrupt bytes -> null row via explode_outer.
    "m03_frame_sample" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val colors = (0 until 6).map(k => (k * 40 << 16) | (k * 30 << 8) | (k * 20))
      val rows = Seq(
        (1L, makeAnimatedGif(16, 9, colors)),
        (2L, makeImage(12, 5, 0xff0000, "gif")),
        (3L, "definitely not a gif".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          explode_outer(M.gifFrameStats(col("payload"), 3)).as("f"))
        .select(col("media_id"),
          col("f.frameIndex").as("frame_index"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.meanR").as("mean_r"), col("f.meanG").as("mean_g"),
          col("f.meanB").as("mean_b"))
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // MP4 / ISO-BMFF container metadata: brand, movie duration, track
    // count, video dims — a pure moov/mvhd/tkhd header walk, no codec
    // (retires the honest part of the compressed-AV gap; frame DECODE
    // stays behind the disclosed avFrameSample stub). Covers version-0
    // and version-1 full boxes, audio-only files (no video dims), and
    // corrupt payloads (null row, never a task failure).
    "m04_mp4_meta" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = Seq(
        // v0 boxes: 24.5 s @ timescale 1000; video 640x360 + audio track
        (1L, ftyp("isom") ++ box("moov",
          box("mvhd", mvhd(0, 1000, 24500L)),
          box("trak", box("tkhd", tkhd(0, 1, 24500L, 640, 360))),
          box("trak", box("tkhd", tkhd(0, 2, 24500L, 0, 0)))) ++ box("mdat")),
        // v1 boxes (64-bit times): 3.25 s @ 90 kHz; 1920x1080
        (2L, ftyp("mp42") ++ box("moov",
          box("mvhd", mvhd(1, 90000, 292500L)),
          box("trak", box("tkhd", tkhd(1, 1, 292500L, 1920, 1080))))),
        // audio-only (M4A): duration real, no video track -> null dims
        (3L, ftyp("M4A ") ++ box("moov",
          box("mvhd", mvhd(0, 44100, 44100L)),
          box("trak", box("tkhd", tkhd(0, 1, 44100L, 0, 0))))),
        (4L, "this is not an mp4 container".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          M.mp4Meta(col("payload")).getField("brand").as("brand"),
          M.mp4Meta(col("payload")).getField("timescale").as("timescale"),
          M.mp4Meta(col("payload")).getField("durationS").as("duration_s"),
          M.mp4Meta(col("payload")).getField("nTracks").as("n_tracks"),
          M.mp4Meta(col("payload")).getField("width").as("width"),
          M.mp4Meta(col("payload")).getField("height").as("height"))
        .orderBy(col("media_id"))
    }),

    // COMPRESSED-AV frame sampling, for real: MJPEG-in-AVI, the one AV
    // codec family the stock JVM decodes (every frame a baseline JPEG
    // through ImageIO). Solid GRAY frames round-trip JPEG's YCbCr
    // transform losslessly (Cb = Cr = 128, Y = the gray value), so the
    // decoded means are hand-derivable — gray 128 exactly (zero DC
    // after level shift), and the quantized extremes clamp to 0/255.
    // Frame offsets prove the RIFF walk: they are pure container
    // arithmetic. Corrupt bytes -> null row, never a task failure.
    "m05_mjpeg_frames" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val grays = Seq(0, 64, 128, 192, 255, 32)
      val clip = makeAvi(16, 8, 40000,
        grays.map(v => makeImage(16, 8, (v << 16) | (v << 8) | v, "jpg")))
      val single = makeAvi(8, 8, 100000,
        Seq(makeImage(8, 8, 0x808080, "jpg")))
      val rows = Seq(
        (1L, clip),
        (2L, single),
        (3L, "definitely not an avi".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          explode_outer(M.aviMjpegFrames(col("payload"), 3)).as("f"))
        .select(col("media_id"),
          col("f.frameIndex").as("frame_index"),
          col("f.offset").as("frame_offset"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.meanR").as("mean_r"), col("f.meanG").as("mean_g"),
          col("f.meanB").as("mean_b"))
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // MPEG audio (MP3) metadata: ID3v2 skip + per-frame header walk —
    // frame count and duration are exact container arithmetic
    // (samplesPerFrame / rate per frame), no codec involved, same
    // doctrine as m04's box walk. Fixtures are hand-built CBR streams
    // (header bytes + zero payload), so every output cell is derivable
    // on paper: 3 frames of MPEG1 L3 @44100 -> 3*1152/44100 s; 2
    // frames of MPEG2 L3 @22050 -> 2*576/22050 s. Corrupt payload ->
    // null row, never a task failure.
    "m06_mp3_meta" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = Seq(
        // MPEG1 Layer III 128 kbps 44.1 kHz stereo, 10-byte ID3v2 body:
        // frameLen = 144*128000/44100 = 417
        (1L, makeMp3(3, Array(0xff, 0xfb, 0x90, 0x00), 417, id3Bytes = 10)),
        // MPEG2 Layer III 64 kbps 22.05 kHz mono, no tag:
        // frameLen = 72*64000/22050 = 208
        (2L, makeMp3(2, Array(0xff, 0xf3, 0x80, 0xc0), 208)),
        (3L, "definitely not mpeg audio".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      val m = M.mp3Meta(col("payload"))
      df.select(col("media_id"),
          m.getField("version").as("version"),
          m.getField("layer").as("layer"),
          m.getField("bitrateKbps").as("bitrate_kbps"),
          m.getField("sampleRate").as("sample_rate"),
          m.getField("channels").as("channels"),
          m.getField("nFrames").as("n_frames"),
          m.getField("durationS").as("duration_s"),
          m.getField("hasId3").cast("int").as("has_id3"))
        .orderBy(col("media_id"))
    }),

    // Real pixel decode with a HAND-DERIVABLE oracle: crafted baseline
    // JPEGs whose decoded samples are exact by construction (see
    // craftGrayJpeg — DC-only blocks with Q=8 decode to 128+dc in every
    // conforming decoder, no IDCT approximation), sampled on the 4x4
    // deterministic pixel grid. This oracle-gates the JPEG decode path
    // end to end; the avFrameSample stub remains only for MP4 (the JVM
    // has no H.264/AAC codec), its GIF/MJPEG/JPEG paths are all real
    // and pinned (m03/m05/m07).
    "m07_jpeg_pixels" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = Seq(
        (1, craftGrayJpeg(Seq(0))),                   // 8x8: all 128
        (2, craftGrayJpeg(Seq(-64, 63))),             // 16x8: 64 | 191
        (3, craftGrayJpeg(Seq(-100, -50, 50, 100))))  // 32x8: 28|78|178|228
      s.createDataFrame(rows).toDF("jpeg_id", "data")
        .select(col("jpeg_id"),
          explode(M.jpegPixelGrid(col("data"), 4)).as("p"))
        .select(col("jpeg_id"), col("p.x").as("x"), col("p.y").as("y"),
          col("p.r").as("r"), col("p.g").as("g"), col("p.b").as("b"))
        .orderBy(col("jpeg_id"), col("y"), col("x"))
    }),
    // Windowed audio FEATURES (the per-document feature matrix, not just
    // whole-file stats): per 400-frame window of the channel mixdown,
    // peak / RMS / zero-crossing rate. Fixtures are exact by
    // construction: a period-8 square wave flips sign every 4 frames
    // (99 in-window flips per 400-frame window -> zcr 0.2475), a
    // period-2 wave flips every frame (399/400, and the short 200-frame
    // tail window 199/200), stereo silence is all zeros with a 41-frame
    // tail, an 8-bit file and corrupt bytes yield one null row each.
    "m08_audio_features" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val square8 = Array.tabulate(1600)(i => if ((i / 4) % 2 == 0) 8000 else -8000)
      val square2 = Array.tabulate(1000)(i => if (i % 2 == 0) 8000 else -8000)
      val rows = Seq(
        (1L, makeWav(1, 8000, 16, square8)),
        (2L, makeWav(1, 8000, 16, square2)),
        (3L, makeWav(2, 44100, 16, new Array[Int](882))), // 441 stereo silence frames
        (4L, makeWav(1, 8000, 8, Array.fill(800)(128))),  // 8-bit: no 16-bit features
        (5L, "not audio at all".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          explode_outer(M.audioWindows(col("payload"), 400)).as("w"))
        .select(col("media_id"),
          col("w.windowIndex").as("window_index"),
          col("w.nFrames").as("n_frames"),
          col("w.peak").as("peak"), col("w.rms").as("rms"),
          col("w.zcr").as("zcr"))
        .orderBy(col("media_id"), col("window_index"))
    }),

    // Image near-dup DEDUP — the multimodal leg of the dedup family
    // (d02 MinHash for text, e08 SRP for embeddings, this for images):
    // 64-bit perceptual dHash per image (8 bytes, from REAL decoded
    // pixels via the m07 decoder), banded into 4×16-bit LSH keys, a
    // bucket equi-join proposes candidates (never all pairs — the d08
    // mega-bucket cap applies), and a hamming≤3 verify on the 8-byte
    // codes confirms. Any pair within hamming 3 shares a clean band by
    // pigeonhole, so candidate recall is exact for the verify
    // threshold. Fixture images are crafted 8×8-block grids (64×64 px,
    // exact pixels by construction): two identical, two one/two-block
    // mutations, an unrelated pattern with its own mutated twin, and a
    // non-JPEG row that must become NULL and drop out — the oracle
    // re-derives every hash from the block values alone, so decoder,
    // sampler, packer and join are all on the hook. At 100 TB: codes
    // are 8 bytes/image, bands shuffle (img_id, band, key) only, and
    // the verify join touches codes, never pixels.
    "m09_image_neardup" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = m09Grids.map { case (id, g) =>
        (id.toLong, craftGrayJpeg2D(g))
      } :+ ((99L, "not a jpeg at all".getBytes))
      val df = s.createDataFrame(rows).toDF("img_id", "payload")
      val codes = df
        .select(col("img_id"), M.jpegDhash(col("payload")).as("dh"))
        .filter(col("dh").isNotNull)
        .select(col("img_id"), col("dh.h0").as("h0"), col("dh.h1").as("h1"))
      bandedHammingPairs(codes, "img_id", "img_a", "img_b")
    }),

    // Streaming image dedup-on-arrival — m09's dHash codes through the
    // SAME stateful operator as d28 (text) and e25 (embeddings): the
    // modality triple proves the operator is code-family-agnostic.
    // Images decode once (real JPEG pixels), arrive in three waves, and
    // every arrival within hamming 3 of an EARLIER image is flagged;
    // the oracle re-derives each hash from the crafted block grids and
    // replays the arrival rule relationally.
    "m14_streaming_image_neardup" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = m09Grids.map { case (id, g) =>
        (id.toLong, craftGrayJpeg2D(g))
      } :+ ((99L, "not a jpeg at all".getBytes))
      val codes = s.createDataFrame(rows).toDF("img_id", "payload")
        .select(col("img_id").as("doc_id"), M.jpegDhash(col("payload")).as("dh"))
        .filter(col("dh").isNotNull)
        .select(col("doc_id"), col("dh.h0").as("h0"), col("dh.h1").as("h1"))
      StreamingDedup.summary(s, codes, "m14")
    }),

    // Audio near-dup DEDUP — the third modality of the dedup family
    // (text d02, embeddings e08, images m09, audio here): a 64-bit
    // sign-of-delta fingerprint over the windowed RMS envelope (the
    // dHash idea applied to loudness shape, computed from REAL decoded
    // PCM via the m08 window kernel), searched by the SAME banded
    // hamming pipeline as m09 — one shared implementation, two
    // modalities. Fixtures are square waves whose per-window amplitude
    // IS the window RMS (constant |amplitude| over a window makes
    // rms = amp exactly), so the oracle re-derives every fingerprint
    // from the amplitude lists alone. Mutating only the LAST window's
    // amplitude flips exactly bit 63; mutating the first flips bit 0 —
    // hamming by construction: (1,2)=0, (1,3)=(3,4)=(5,6)=1, (1,4)=2.
    // An 8-bit WAV and a garbage row must null out and drop.
    "m10_audio_neardup" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = m10Amps.map { case (id, amps) =>
        (id.toLong, makeWav(1, 8000, 16, squareSamples(amps, 400)))
      } :+ ((98L, makeWav(1, 8000, 8, Array.fill(800)(128)))) :+
        ((99L, "definitely not audio".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      val codes = df
        .select(col("media_id"), M.audioFingerprint(col("payload"), 400).as("fp"))
        .filter(col("fp").isNotNull)
        .select(col("media_id"), col("fp.h0").as("h0"), col("fp.h1").as("h1"))
      bandedHammingPairs(codes, "media_id", "media_a", "media_b")
    }),

    // Image RESIZE (the brief's decode / feature-extract / RESIZE /
    // frame-sample quartet): exact box-filter thumbnails at 8×8 and
    // 4×4 over the crafted 64×64 images — the model-input
    // normalization step of a multimodal pipeline, per-row kernel, no
    // shuffle below the output sort. The craft theorem makes every
    // output cell hand-derivable: an 8×8 thumbnail cell covers exactly
    // one flat block (gray = 128 + dc), a 4×4 cell averages a 2×2
    // block quad (gray = 128 + quad-mean, exact in binary since the
    // divisor is a power of two). The junk row must decode to null and
    // drop, never fail the task.
    "m12_image_thumbnail" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val grids = m09Grids.toMap
      val rows = Seq(1, 5).map(id =>
        (id.toLong, craftGrayJpeg2D(grids(id)))) :+
        ((99L, "not an image".getBytes))
      val df = s.createDataFrame(rows).toDF("img_id", "payload")
      Seq(8, 4).map { n =>
        df.select(col("img_id"),
            explode(M.imageResize(col("payload"), n, n)).as("p"))
          .select(col("img_id"), lit(n.toLong).as("size"),
            col("p.y").as("y"), col("p.x").as("x"), col("p.gray").as("gray"))
      }.reduce(_ unionAll _)
        .orderBy(col("img_id"), col("size").desc, col("y"), col("x"))
    }),

    // MIXED-FORMAT image dedup — m09 without the container blinders: a
    // real crawl's images arrive as JPEG, PNG, GIF and BMP renditions
    // of the same pixels, and a per-format fingerprint silently splits
    // those duplicate classes. imageDhash routes every ImageIO
    // container through ONE dHash core (single-band rasters read raw
    // samples only when not palette-indexed — a GIF's band holds
    // palette INDICES), so lossless re-saves of the same grid land at
    // hamming 0 from the crafted JPEG whose decoded pixels the m09
    // craft theorem fixes: the oracle derives every hash from the
    // BLOCK VALUES alone and fans it out over the format copies.
    // Corpus: the 6 m09 JPEGs + PNG and BMP re-saves of all 6 + a GIF
    // of grid 1 + junk. Same banded pipeline, candidates never pixels.
    "m13_mixed_image_neardup" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val gridsMap = m09Grids.toMap
      val rows = m09Grids.map { case (id, g) => (id.toLong, craftGrayJpeg2D(g)) } ++
        m09Grids.map { case (id, g) => (100L + id, makeGrayImage(g, "png")) } ++
        m09Grids.map { case (id, g) => (200L + id, makeGrayImage(g, "bmp")) } :+
        ((301L, makeGrayImage(gridsMap(1), "gif"))) :+
        ((999L, "not an image at all".getBytes))
      val df = s.createDataFrame(rows).toDF("img_id", "payload")
      val codes = df
        .select(col("img_id"), M.imageDhash(col("payload")).as("dh"))
        .filter(col("dh").isNotNull)
        .select(col("img_id"), col("dh.h0").as("h0"), col("dh.h1").as("h1"))
      bandedHammingPairs(codes, "img_id", "img_a", "img_b")
    }),

    // VIDEO near-dup DEDUP — the fourth modality (text d22, image m09,
    // audio m10): a clip's fingerprint is the SEQUENCE of per-sampled-
    // frame dHashes (4 evenly spaced frames, each REAL baseline-JPEG
    // decode via m05's container walk), two clips are near-dups when
    // they sample the same frame count and EVERY aligned frame pair is
    // within hamming 3. Candidates come from banding the FIRST frame's
    // code through the shared m09/m10 pipeline (a clip within the
    // all-frames rule is within 3 on frame 0, so banding recall is
    // exact); the verify joins the remaining 8-byte frame codes by
    // sample position — pixels are touched once, at hash time. The
    // fixture set: identical clips, a last-frame one-block mutation, an
    // unrelated pair with a first-frame mutation, a 3-frame PREFIX of
    // clip 1 (same frames, fewer — must be excluded by the frame-count
    // rule), and a garbage row that must null out.
    "m11_video_neardup" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = m11Clips.map { case (id, grids) =>
        (id.toLong, makeAvi(64, 64, 40000, grids.map(craftGrayJpeg2D)))
      } :+ ((99L, "definitely not a video".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      val fh = df.select(col("media_id"),
          M.aviFrameDhashes(col("payload"), 4).as("fhs"))
        .filter(col("fhs").isNotNull)
      val frames = fh.select(col("media_id"), explode(col("fhs")).as("f"))
        .select(col("media_id"), col("f.frameIndex").as("fidx"),
          col("f.h0").as("h0"), col("f.h1").as("h1"))
      val nf = fh.select(col("media_id"), size(col("fhs")).as("n"))
      val cand = bandedHammingPairs(frames.filter(col("fidx") === 0),
          "media_id", "media_a", "media_b")
        .select(col("media_a"), col("media_b"))
      cand
        .join(nf.select(col("media_id").as("media_a"), col("n").as("na")), "media_a")
        .join(nf.select(col("media_id").as("media_b"), col("n").as("nb")), "media_b")
        .filter(col("na") === col("nb"))
        .join(frames.select(col("media_id").as("media_a"), col("fidx"),
          col("h0").as("a0"), col("h1").as("a1")), Seq("media_a"))
        .join(frames.select(col("media_id").as("media_b"), col("fidx"),
          col("h0").as("b0"), col("h1").as("b1")), Seq("media_b", "fidx"))
        .groupBy(col("media_a"), col("media_b"), col("na"))
        .agg(max(expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1)"))
          .as("max_frame_hamming"),
          count(lit(1)).as("n_compared"))
        .filter(col("max_frame_hamming") <= 3 && col("n_compared") === col("na"))
        .select(col("media_a"), col("media_b"),
          col("na").cast("long").as("n_frames"),
          col("max_frame_hamming").cast("long").as("max_frame_hamming"))
        .orderBy(col("media_a"), col("media_b"))
    }),
  )

  /** Banded-hamming near-dup pairs over 64-bit codes packed as two
    * 32-bit halves (`h0`/`h1`): 4×16-bit LSH band keys, candidates from
    * a bucket equi-join behind the 64-cap mega-bucket guard (the d08
    * doctrine), exact hamming <= `maxHamming` verified on the 8-byte
    * codes. Any pair within hamming 3 shares a clean band by
    * pigeonhole, so candidate recall is exact at the default
    * threshold. Shared by m09 (image dHash) and m10 (audio
    * fingerprint): at 100 TB only (id, band, 16-bit key) rows shuffle
    * and the verify join touches codes, never payloads.
    */
  private[graft] def bandedHammingPairs(codes: DataFrame, idCol: String,
      outA: String, outB: String, maxHamming: Int = 3,
      bucketCap: Int = 64): DataFrame = {
    // the 8-byte codes RIDE the band explode (16 extra bytes per band
    // row) so the (band_id, bkey) exchange is the single site feeding
    // all three consumers — the size guard and both self-join sides
    // (the e08 ReusedExchange doctrine) — and the expensive upstream
    // kernel (JPEG decode for m09, the SimHash UDF for d22) evaluates
    // ONCE; the verify reads codes off the joined band rows instead of
    // re-joining the code table, so no kernel re-evaluation anywhere.
    val bands = codes.select(col(idCol).as("_id"), col("h0"), col("h1"),
        posexplode(array(
          col("h0").bitwiseAND(lit(65535L)),
          shiftright(col("h0"), 16).bitwiseAND(lit(65535L)),
          col("h1").bitwiseAND(lit(65535L)),
          shiftright(col("h1"), 16).bitwiseAND(lit(65535L))))
          .as(Seq("band_id", "bkey")))
    val kept = bands.groupBy(col("band_id"), col("bkey"))
      .agg(count(lit(1)).as("n_in_bucket"))
      .filter(col("n_in_bucket") <= bucketCap)
      .select(col("band_id"), col("bkey"))
    val pruned = bands.join(kept, Seq("band_id", "bkey"))
    pruned.as("a").join(pruned.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bkey") === col("b.bkey") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as(outA), col("b._id").as(outB),
        (expr("bit_count(a.h0 ^ b.h0)") + expr("bit_count(a.h1 ^ b.h1)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col(outA), col(outB))
  }

  /** The m10 fixture amplitude envelopes (65 windows each; window RMS =
    * amplitude exactly for a constant-|amplitude| square wave). 1 = a
    * deterministic envelope; 2 = exact copy; 3/4 = last-window and
    * first+last-window mutations (each end window participates in ONE
    * delta comparison, so they flip exactly bits 63 / 0 and 63); 5 = an
    * unrelated envelope; 6 = 5 with the last window mutated.
    */
  private[graft] def m10Amps: Seq[(Int, Seq[Int])] = {
    val a = Seq.tabulate(65)(w => 100 + ((w * 7) % 13) * 50)
    val e = Seq.tabulate(65)(w => 100 + ((w * 5 + 3) % 11) * 60)
    Seq(1 -> a, 2 -> a, 3 -> a.updated(64, 800),
      4 -> a.updated(0, 500).updated(64, 800), 5 -> e, 6 -> e.updated(64, 900))
  }

  /** The m11 fixture clips: per-video frame grids (8×8 blocks each,
    * the m09 craft theorem). 1 = four distinct patterned frames; 2 =
    * exact copy; 3 = clip 1 with frame 3's block (5,7) mutated to flip
    * ONE sampled comparison (max frame hamming 1); 4 = unrelated
    * frames; 5 = clip 4 with frame 0's block (2,7) flipped likewise;
    * 6 = the first THREE frames of clip 1 (frame-count rule must
    * exclude it despite identical frames).
    */
  private[graft] def m11Clips: Seq[(Int, Seq[Seq[Seq[Int]]])] = {
    def g(sa: Int, sb: Int) =
      Seq.tabulate(8, 8)((r, c) => ((c * sa + r * sb) % 7) * 15 - 45)
    def mut(grid: Seq[Seq[Int]], r: Int, c: Int, v: Int) =
      grid.updated(r, grid(r).updated(c, v))
    val v1 = Seq(g(3, 5), g(2, 7), g(5, 3), g(4, 9))
    // g(4,9) at (5,6)=45 > (5,7)=0 -> bit set; 50 un-sets it
    val v3 = v1.updated(3, mut(v1(3), 5, 7, 50))
    val v4 = Seq(g(6, 1), g(1, 6), g(7, 2), g(2, 9))
    // g(6,1) at (2,6)=0 > (2,7)=-15 -> bit set; 10 un-sets it
    val v5 = v4.updated(0, mut(v4(0), 2, 7, 10))
    Seq(1 -> v1, 2 -> v1, 3 -> v3, 4 -> v4, 5 -> v5, 6 -> v1.take(3))
  }

  /** Square-wave PCM (period 8) whose amplitude is constant within each
    * `windowFrames`-sized window: amps(w) for window w.
    */
  private[graft] def squareSamples(amps: Seq[Int], windowFrames: Int): Array[Int] = {
    val out = new Array[Int](amps.length * windowFrames)
    var w = 0
    while (w < amps.length) {
      var i = 0
      while (i < windowFrames) {
        out(w * windowFrames + i) = if ((i / 4) % 2 == 0) amps(w) else -amps(w)
        i += 1
      }
      w += 1
    }
    out
  }

  /** The m09 fixture block grids (8×8 blocks = 64×64 px each). Grid 1 =
    * a checkerboard; 2 = exact copy; 3/4 = one- and two-block
    * mutations, each flipping exactly one sampled comparison (block
    * col 7 is sampled only at grid col 8, so a (r,7) mutation flips
    * only bit r·8+7); 5 = an unrelated deterministic pattern; 6 = 5
    * with one such mutation. Hamming by construction: (1,2)=0,
    * (1,3)=(2,3)=(3,4)=(5,6)=1, (1,4)=(2,4)=2.
    */
  /** Lossless grayscale rendition of an m09 block grid (each block a
    * flat 8×8 of gray 128+dc) in any ImageIO container — the pixels a
    * conforming decoder recovers from [[craftGrayJpeg2D]] of the same
    * grid, so cross-format copies hash identically by construction.
    */
  private[graft] def makeGrayImage(grid: Seq[Seq[Int]], format: String): Array[Byte] = {
    val h = grid.length * 8
    val w = grid.head.length * 8
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, 128 + grid(y / 8)(x / 8))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  private[graft] def m09Grids: Seq[(Int, Seq[Seq[Int]])] = {
    val a = Seq.tabulate(8, 8)((r, c) => ((c + r) % 2) * 60 - 30)
    val e = Seq.tabulate(8, 8)((r, c) => ((c * 3 + r * 5) % 7) * 15 - 45)
    def mut(g: Seq[Seq[Int]], r: Int, c: Int, v: Int) =
      g.updated(r, g(r).updated(c, v))
    Seq(1 -> a, 2 -> a, 3 -> mut(a, 5, 7, 40),
      4 -> mut(mut(a, 2, 7, 40), 5, 7, 40), 5 -> e, 6 -> mut(e, 3, 7, 40))
  }

  /** Hand-crafted baseline grayscale JPEG: `dcs` flat 8×8 blocks laid
    * out horizontally, quantization table all 8s, zero AC coefficients.
    * The decoded value of block k is EXACTLY 128 + dcs(k) in every
    * conforming decoder: the dequantized DC is dc·8, a DC-only IDCT
    * yields the flat value dc·8/8 = dc with no AC terms to approximate,
    * and the JPEG level shift adds 128 — so an oracle can derive every
    * pixel by hand from the byte layout alone. Custom Huffman tables:
    * DC categories 0–7 as 4-bit codes (code of category c = c), AC as
    * the single 1-bit EOB code "0".
    */
  private[graft] def craftGrayJpeg(dcs: Seq[Int]): Array[Byte] =
    craftGrayJpeg2D(Seq(dcs))

  /** 2-D variant of [[craftGrayJpeg]]: `grid` is a rectangular block
    * grid (row-major raster order, exactly how baseline JPEG scans
    * 1-component MCUs), so images taller than one block row — the shape
    * the m09 perceptual hash needs — keep the same exact-pixel
    * guarantee: pixel of block (r,c) = 128 + grid(r)(c).
    */
  private[graft] def craftGrayJpeg2D(grid: Seq[Seq[Int]]): Array[Byte] = {
    require(grid.nonEmpty && grid.forall(_.length == grid.head.length))
    val dcs = grid.flatten
    require(dcs.nonEmpty && dcs.forall(v => v > -128 && v < 128))
    val w = 8 * grid.head.length
    val h = 8 * grid.length
    val out = new ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xFF); out.write(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xFF); out.write(0xD8) // SOI
    marker(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(8)) // DQT: all 8s
    marker(0xC0, Array[Byte](8, (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0)) // SOF0, 1 comp 1:1
    marker(0xC4, Array[Byte](0x00) ++ // DC table: 8 codes of length 4
      Array[Byte](0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      (0 until 8).map(_.toByte))
    marker(0xC4, Array[Byte](0x10) ++ // AC table: single 1-bit EOB code
      (Array[Byte](1) ++ Array.fill[Byte](15)(0)) ++ Array[Byte](0))
    marker(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    val body = new ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { // byte-stuff 0xFF per spec
          body.write(acc); if (acc == 0xFF) body.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    var prev = 0
    dcs.foreach { v =>
      val diff = v - prev
      prev = v
      val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // 0 for 0
      require(cat <= 7, s"DC diff $diff needs category $cat > 7")
      putBits(cat, 4)
      if (cat > 0) putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      putBits(0, 1) // EOB
    }
    if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    out.write(body.toByteArray)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Minimal CBR MPEG audio stream: n identical Layer III frames
    * (4-byte header + zero payload), optionally prefixed by an ID3v2
    * tag with `id3Bytes` of body (syncsafe length).
    */
  private def makeMp3(n: Int, header: Array[Int], frameLen: Int,
      id3Bytes: Int = -1): Array[Byte] = {
    val tag =
      if (id3Bytes < 0) Array.empty[Byte]
      else {
        val t = new Array[Byte](10 + id3Bytes)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 3
        t(8) = ((id3Bytes >> 7) & 0x7f).toByte; t(9) = (id3Bytes & 0x7f).toByte
        t
      }
    val frames = new Array[Byte](n * frameLen)
    for (i <- 0 until n; j <- header.indices)
      frames(i * frameLen + j) = header(j).toByte
    tag ++ frames
  }

  val oracleSql: Map[String, String] = Map(
    "m01_image_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,
         CAST(mean_b AS DOUBLE) AS mean_b FROM (VALUES
         (1, 'png', 31, 17, 64.0, 96.0, 128.0),
         (2, 'gif', 12, 34, 255.0, 0.0, 0.0),
         (3, 'bmp', 8, 9, 16.0, 32.0, 48.0),
         (4, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, format, width, height, mean_r, mean_g, mean_b)
         ORDER BY media_id""",
    // Hand-derivable: square wave of amplitude 8000 has peak = rms =
    // mean_abs = 8000; 1600 frames @ 8000 Hz = 0.2 s; 441 stereo frames
    // @ 44100 Hz = 0.01 s; the 8-bit row has meta but null 16-bit stats.
    "m02_audio_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
         CAST(channels AS INT) AS channels, CAST(sample_rate AS INT) AS sample_rate,
         CAST(bits AS INT) AS bits, CAST(n_frames AS BIGINT) AS n_frames,
         CAST(duration_s AS DOUBLE) AS duration_s, CAST(peak AS INT) AS peak,
         CAST(rms AS DOUBLE) AS rms, CAST(mean_abs AS DOUBLE) AS mean_abs
         FROM (VALUES
         (1, 'wav', 1, 8000, 16, 1600, 0.2, 8000, 8000.0, 8000.0),
         (2, 'wav', 2, 44100, 16, 441, 0.01, 0, 0.0, 0.0),
         (3, 'wav', 1, 8000, 8, 800, 0.1, NULL, NULL, NULL),
         (4, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, format, channels, sample_rate, bits, n_frames,
           duration_s, peak, rms, mean_abs)
         ORDER BY media_id""",
    // Hand-derivable: frame k is solid rgb(40k, 30k, 20k); sampling 3 of
    // 6 frames picks indices 0, 2, 4; the single-frame GIF samples its
    // frame 0 (solid red); corrupt bytes -> one all-null row.
    "m03_frame_sample" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id,
         CAST(frame_index AS INT) AS frame_index,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,
         CAST(mean_b AS DOUBLE) AS mean_b FROM (VALUES
         (1, 0, 16, 9, 0.0, 0.0, 0.0),
         (1, 2, 16, 9, 80.0, 60.0, 40.0),
         (1, 4, 16, 9, 160.0, 120.0, 80.0),
         (2, 0, 12, 5, 255.0, 0.0, 0.0),
         (3, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, frame_index, width, height, mean_r, mean_g, mean_b)
         ORDER BY media_id, frame_index""",
    // Hand-derivable: durations are duration/timescale (24500/1000,
    // 292500/90000, 44100/44100); dims come from the tkhd 16.16 fields;
    // the audio-only file has a track but no video dims; corrupt -> nulls.
    "m04_mp4_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, brand,
         CAST(timescale AS BIGINT) AS timescale,
         CAST(duration_s AS DOUBLE) AS duration_s, CAST(n_tracks AS INT) AS n_tracks,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height FROM (VALUES
         (1, 'isom', 1000, 24.5, 2, 640, 360),
         (2, 'mp42', 90000, 3.25, 1, 1920, 1080),
         (3, 'M4A ', 44100, 1.0, 1, NULL, NULL),
         (4, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, brand, timescale, duration_s, n_tracks, width, height)
         ORDER BY media_id""",
    // Hand-derivable: sampling 3 of 6 frames picks indices 0, 2, 4 —
    // gray values 0, 128, 255, which survive JPEG's YCbCr round-trip
    // exactly (gray => Cb = Cr = 128; 128 has zero DC after the level
    // shift, 0/255 clamp). Frame 0's offset is pure container
    // arithmetic: RIFF hdr 12 + hdrl LIST 76 + movi LIST hdr 12 +
    // chunk hdr 8 = 108; later offsets add the ImageIO-encoded JPEG
    // sizes (deterministic for a fixed JVM encoder). Corrupt -> nulls.
    "m05_mjpeg_frames" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id,
         CAST(frame_index AS INT) AS frame_index,
         CAST(frame_offset AS BIGINT) AS frame_offset,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,
         CAST(mean_b AS DOUBLE) AS mean_b FROM (VALUES
         (1, 0, 108, 16, 8, 0.0, 0.0, 0.0),
         (1, 2, 1388, 16, 8, 128.0, 128.0, 128.0),
         (1, 4, 2666, 16, 8, 255.0, 255.0, 255.0),
         (2, 0, 108, 8, 8, 128.0, 128.0, 128.0),
         (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, frame_index, frame_offset, width, height,
           mean_r, mean_g, mean_b)
         ORDER BY media_id, frame_index""",
    // hand derivation: (1) 3 frames * 1152 samples / 44100 Hz =
    // 0.078367 s (rint at micros); (2) 2 * 576 / 22050 = 0.052245 s
    "m06_mp3_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, version,
         CAST(layer AS INT) AS layer,
         CAST(bitrate_kbps AS INT) AS bitrate_kbps,
         CAST(sample_rate AS INT) AS sample_rate,
         CAST(channels AS INT) AS channels,
         CAST(n_frames AS BIGINT) AS n_frames,
         CAST(duration_s AS DOUBLE) AS duration_s,
         CAST(has_id3 AS INT) AS has_id3 FROM (VALUES
         (1, 'mpeg1', 3, 128, 44100, 2, 3, 0.078367, 1),
         (2, 'mpeg2', 3, 64, 22050, 1, 2, 0.052245, 0),
         (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, version, layer, bitrate_kbps, sample_rate, channels,
           n_frames, duration_s, has_id3)
         ORDER BY media_id""",
    // Hand-derived from the crafted JPEG byte layout (craftGrayJpeg):
    // block k of jpeg j decodes to exactly 128 + dc(j,k) — dc values
    // (0), (-64,63), (-100,-50,50,100). 4x4 grid positions are
    // floor((extent-1)*i/3): x in {0,2,4,7} (w=8), {0,5,10,15} (w=16),
    // {0,10,20,31} (w=32); y in {0,2,4,7}. Each sampled x falls in
    // block floor(x/8), so the gray value per (jpeg_id, x) is fixed and
    // independent of y; r=g=b for a grayscale source.
    "m07_jpeg_pixels" ->
      """SELECT CAST(jpeg_id AS INT) AS jpeg_id, CAST(x AS INT) AS x,
         CAST(y AS INT) AS y, CAST(v AS INT) AS r, CAST(v AS INT) AS g,
         CAST(v AS INT) AS b
         FROM (VALUES
           (1,0,128),(1,2,128),(1,4,128),(1,7,128),
           (2,0,64),(2,5,64),(2,10,191),(2,15,191),
           (3,0,28),(3,10,78),(3,20,178),(3,31,228))
           px(jpeg_id, x, v)
         CROSS JOIN (VALUES (0),(2),(4),(7)) ys(y)
         ORDER BY jpeg_id, y, x""",
    // Hand-derivable: the period-8 square flips sign at frames 4,8,...,
    // 396 inside every 400-frame window (99 flips, boundary pair not
    // counted) -> zcr 99/400; the period-2 square flips at every
    // in-window pair -> 399/400 and 199/200 for the tail; |amplitude|
    // is 8000 everywhere for both -> peak = rms = 8000; silence is all
    // zeros (441 = 400 + 41 frames); 8-bit and corrupt rows are null.
    "m08_audio_features" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id,
         CAST(window_index AS INT) AS window_index,
         CAST(n_frames AS INT) AS n_frames,
         CAST(peak AS DOUBLE) AS peak, CAST(rms AS DOUBLE) AS rms,
         CAST(zcr AS DOUBLE) AS zcr FROM (VALUES
         (1, 0, 400, 8000.0, 8000.0, 0.2475),
         (1, 1, 400, 8000.0, 8000.0, 0.2475),
         (1, 2, 400, 8000.0, 8000.0, 0.2475),
         (1, 3, 400, 8000.0, 8000.0, 0.2475),
         (2, 0, 400, 8000.0, 8000.0, 0.9975),
         (2, 1, 400, 8000.0, 8000.0, 0.9975),
         (2, 2, 200, 8000.0, 8000.0, 0.995),
         (3, 0, 400, 0.0, 0.0, 0.0),
         (3, 1, 41, 0.0, 0.0, 0.0),
         (4, NULL, NULL, NULL, NULL, NULL),
         (5, NULL, NULL, NULL, NULL, NULL))
         t(media_id, window_index, n_frames, peak, rms, zcr)
         ORDER BY media_id, window_index""",
    // the oracle re-derives every dHash from the block grids alone
    // (sampled pixel of (j,i) = 128 + dc at block (y//8, x//8) with
    // x = 63i//8, y = 63j//7 — the craft theorem), then mirrors the
    // band/bucket/hamming pipeline in SQL; only the grid VALUES are
    // shared with the fixture builder
    "m09_image_neardup" -> {
      val values = m09Grids.map { case (id, g) =>
        s"($id, ${g.flatten.mkString("[", ", ", "]")})"
      }.mkString(",\n           ")
      s"""WITH imgs(img_id, dc) AS (VALUES
           $values),
         grid AS (
           SELECT img_id, CAST(j AS INT) AS j, CAST(i AS INT) AS i,
             128 + dc[CAST(((63 * j) // 7 // 8) * 8
                         + ((63 * i) // 8 // 8) + 1 AS INT)] AS v
           FROM imgs,
             (SELECT unnest(range(0, 8)) AS j) jj,
             (SELECT unnest(range(0, 9)) AS i) ii),
         bits AS (
           SELECT g1.img_id, g1.j, g1.i AS cmp,
             CASE WHEN g1.v > g2.v THEN 1 ELSE 0 END AS bit
           FROM grid g1 JOIN grid g2
             ON g2.img_id = g1.img_id AND g2.j = g1.j AND g2.i = g1.i + 1
           WHERE g1.i < 8),
         codes AS (
           SELECT img_id AS id,
             CAST(sum(CASE WHEN j * 8 + cmp < 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp))
               ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN j * 8 + cmp >= 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp - 32))
               ELSE 0 END) AS BIGINT) AS h1
           FROM bits GROUP BY img_id),
         ${hammingTailSql("img_a", "img_b")}"""
    },
    // m14: the same grid-derived codes CTE chain as m09, with the shared
    // streaming-suppression tail (arrival = img_id % 3)
    "m14_streaming_image_neardup" -> {
      val values = m09Grids.map { case (id, g) =>
        s"($id, ${g.flatten.mkString("[", ", ", "]")})"
      }.mkString(",\n           ")
      s"""WITH imgs(img_id, dc) AS (VALUES
           $values),
         grid AS (
           SELECT img_id, CAST(j AS INT) AS j, CAST(i AS INT) AS i,
             128 + dc[CAST(((63 * j) // 7 // 8) * 8
                         + ((63 * i) // 8 // 8) + 1 AS INT)] AS v
           FROM imgs,
             (SELECT unnest(range(0, 8)) AS j) jj,
             (SELECT unnest(range(0, 9)) AS i) ii),
         bits AS (
           SELECT g1.img_id, g1.j, g1.i AS cmp,
             CASE WHEN g1.v > g2.v THEN 1 ELSE 0 END AS bit
           FROM grid g1 JOIN grid g2
             ON g2.img_id = g1.img_id AND g2.j = g1.j AND g2.i = g1.i + 1
           WHERE g1.i < 8),
         codes AS (
           SELECT img_id AS id,
             CAST(sum(CASE WHEN j * 8 + cmp < 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp))
               ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN j * 8 + cmp >= 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp - 32))
               ELSE 0 END) AS BIGINT) AS h1
           FROM bits GROUP BY img_id),
         ${StreamingDedup.suppressionTailSql}"""
    },
    // m09's grid-derived hash table fanned out over the format copies
    // (the pixels are identical by the lossless-rendition construction,
    // so the hashes are too), then the shared banded-hamming tail
    "m13_mixed_image_neardup" -> {
      val values = m09Grids.map { case (id, g) =>
        s"($id, ${g.flatten.mkString("[", ", ", "]")})"
      }.mkString(",\n           ")
      val copies = (m09Grids.map { case (id, _) => (id, id) } ++
        m09Grids.map { case (id, _) => (100 + id, id) } ++
        m09Grids.map { case (id, _) => (200 + id, id) } :+ ((301, 1)))
        .map { case (img, gid) => s"($img, $gid)" }.mkString(", ")
      s"""WITH imgs(gid, dc) AS (VALUES
           $values),
         grid AS (
           SELECT gid, CAST(j AS INT) AS j, CAST(i AS INT) AS i,
             128 + dc[CAST(((63 * j) // 7 // 8) * 8
                         + ((63 * i) // 8 // 8) + 1 AS INT)] AS v
           FROM imgs,
             (SELECT unnest(range(0, 8)) AS j) jj,
             (SELECT unnest(range(0, 9)) AS i) ii),
         bits AS (
           SELECT g1.gid, g1.j, g1.i AS cmp,
             CASE WHEN g1.v > g2.v THEN 1 ELSE 0 END AS bit
           FROM grid g1 JOIN grid g2
             ON g2.gid = g1.gid AND g2.j = g1.j AND g2.i = g1.i + 1
           WHERE g1.i < 8),
         gcodes AS (
           SELECT gid,
             CAST(sum(CASE WHEN j * 8 + cmp < 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp))
               ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN j * 8 + cmp >= 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp - 32))
               ELSE 0 END) AS BIGINT) AS h1
           FROM bits GROUP BY gid),
         maps(img_id, gid) AS (VALUES $copies),
         codes AS (
           SELECT m.img_id AS id, g.h0, g.h1
           FROM maps m JOIN gcodes g ON g.gid = m.gid),
         ${hammingTailSql("img_a", "img_b")}"""
    },
    // the oracle re-derives every fingerprint from the amplitude lists
    // alone (window RMS of a constant-|amplitude| square wave = the
    // amplitude, exactly), then the shared banded-hamming tail
    "m10_audio_neardup" -> {
      val values = m10Amps.map { case (id, amps) =>
        s"($id, ${amps.mkString("[", ", ", "]")})"
      }.mkString(",\n           ")
      s"""WITH media(media_id, amp) AS (VALUES
           $values),
         bits AS (
           SELECT media_id, CAST(i AS INT) AS cmp,
             CASE WHEN amp[CAST(i + 2 AS INT)] > amp[CAST(i + 1 AS INT)]
               THEN 1 ELSE 0 END AS bit
           FROM media, (SELECT unnest(range(0, 64)) AS i) ii),
         codes AS (
           SELECT media_id AS id,
             CAST(sum(CASE WHEN cmp < 32
               THEN bit * (CAST(1 AS BIGINT) << cmp) ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN cmp >= 32
               THEN bit * (CAST(1 AS BIGINT) << (cmp - 32))
               ELSE 0 END) AS BIGINT) AS h1
           FROM bits GROUP BY media_id),
         ${hammingTailSql("media_a", "media_b")}"""
    },
    "m11_video_neardup" -> m11OracleSql,
    // each thumbnail cell derives from the block grid alone: one flat
    // block at 8x8, a 2x2 quad mean at 4x4 (exact: divisor 4)
    "m12_image_thumbnail" -> {
      val values = Seq(1, 5).map { id =>
        val g = m09Grids.toMap.apply(id)
        s"($id, ${g.flatten.mkString("[", ", ", "]")})"
      }.mkString(",\n           ")
      s"""WITH imgs(img_id, dc) AS (VALUES
           $values),
         cells AS (
           SELECT img_id, 8 AS size, CAST(r.y AS INT) AS y, CAST(c.x AS INT) AS x,
             CAST(128 + dc[CAST(r.y * 8 + c.x + 1 AS INT)] AS DOUBLE) AS gray
           FROM imgs,
             (SELECT unnest(range(0, 8)) AS y) r,
             (SELECT unnest(range(0, 8)) AS x) c
           UNION ALL
           SELECT img_id, 4, CAST(r.y AS INT), CAST(c.x AS INT),
             128 + (dc[CAST(r.y * 2 * 8 + c.x * 2 + 1 AS INT)]
                  + dc[CAST(r.y * 2 * 8 + c.x * 2 + 2 AS INT)]
                  + dc[CAST((r.y * 2 + 1) * 8 + c.x * 2 + 1 AS INT)]
                  + dc[CAST((r.y * 2 + 1) * 8 + c.x * 2 + 2 AS INT)]) / 4.0
           FROM imgs,
             (SELECT unnest(range(0, 4)) AS y) r,
             (SELECT unnest(range(0, 4)) AS x) c)
         SELECT CAST(img_id AS BIGINT) AS img_id, CAST(size AS BIGINT) AS size,
           y, x, gray
         FROM cells ORDER BY img_id, size DESC, y, x"""
    },
  )

  /** m11's oracle: per-(clip, frame) dHashes re-derived from the block
    * grids (the m09 pixel theorem), frame-0 codes through the shared
    * candidate CTEs, then the frame-aligned max-hamming verify +
    * frame-count rule in SQL.
    */
  private def m11OracleSql: String = {
    val values = m11Clips.flatMap { case (id, grids) =>
      grids.zipWithIndex.map { case (g, fidx) =>
        s"($id, $fidx, ${g.flatten.mkString("[", ", ", "]")})"
      }
    }.mkString(",\n           ")
    s"""WITH clips(media_id, fidx, dc) AS (VALUES
           $values),
         grid AS (
           SELECT media_id, fidx, CAST(j AS INT) AS j, CAST(i AS INT) AS i,
             128 + dc[CAST(((63 * j) // 7 // 8) * 8
                         + ((63 * i) // 8 // 8) + 1 AS INT)] AS v
           FROM clips,
             (SELECT unnest(range(0, 8)) AS j) jj,
             (SELECT unnest(range(0, 9)) AS i) ii),
         bits AS (
           SELECT g1.media_id, g1.fidx, g1.j, g1.i AS cmp,
             CASE WHEN g1.v > g2.v THEN 1 ELSE 0 END AS bit
           FROM grid g1 JOIN grid g2
             ON g2.media_id = g1.media_id AND g2.fidx = g1.fidx
               AND g2.j = g1.j AND g2.i = g1.i + 1
           WHERE g1.i < 8),
         fcodes AS (
           SELECT media_id, fidx,
             CAST(sum(CASE WHEN j * 8 + cmp < 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp))
               ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN j * 8 + cmp >= 32
               THEN bit * (CAST(1 AS BIGINT) << (j * 8 + cmp - 32))
               ELSE 0 END) AS BIGINT) AS h1
           FROM bits GROUP BY media_id, fidx),
         codes AS (SELECT media_id AS id, h0, h1 FROM fcodes WHERE fidx = 0),
         ${hammingCandSql("media_a", "media_b")},
         nf AS (SELECT media_id, count(*) AS n FROM fcodes GROUP BY media_id),
         per AS (
           SELECT c.media_a, c.media_b,
             bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) AS fham
           FROM cand c
             JOIN fcodes x ON x.media_id = c.media_a
             JOIN fcodes y ON y.media_id = c.media_b AND y.fidx = x.fidx),
         agg AS (
           SELECT media_a, media_b, max(fham) AS max_frame_hamming,
             count(*) AS n_compared
           FROM per GROUP BY media_a, media_b)
         SELECT CAST(g.media_a AS BIGINT) AS media_a,
           CAST(g.media_b AS BIGINT) AS media_b,
           CAST(a.n AS BIGINT) AS n_frames,
           CAST(g.max_frame_hamming AS BIGINT) AS max_frame_hamming
         FROM agg g JOIN nf a ON a.media_id = g.media_a
                    JOIN nf b ON b.media_id = g.media_b
         WHERE g.max_frame_hamming <= 3 AND a.n = b.n AND g.n_compared = a.n
         ORDER BY media_a, media_b"""
  }

  /** The candidate half of [[hammingTailSql]] — band/bucket/cand CTEs
    * over a `codes(id, h0, h1)` CTE upstream; m11 reuses it with its
    * own per-frame verify instead of the pairwise hamming select.
    */
  private[graft] def hammingCandSql(outA: String, outB: String): String =
    s"""bands AS (
         SELECT id, 0 AS band_id, h0 & 65535 AS bkey FROM codes
         UNION ALL SELECT id, 1, (h0 >> 16) & 65535 FROM codes
         UNION ALL SELECT id, 2, h1 & 65535 FROM codes
         UNION ALL SELECT id, 3, (h1 >> 16) & 65535 FROM codes),
       kept AS (SELECT band_id, bkey FROM bands
                GROUP BY band_id, bkey HAVING count(*) <= 64),
       pruned AS (SELECT b.id, b.band_id, b.bkey
                  FROM bands b JOIN kept k
                    ON b.band_id = k.band_id AND b.bkey = k.bkey),
       cand AS (
         SELECT DISTINCT a.id AS $outA, b.id AS $outB
         FROM pruned a JOIN pruned b
           ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.id < b.id)"""

  /** DuckDB mirror of [[bandedHammingPairs]] — expects a
    * `codes(id, h0, h1)` CTE upstream; one text shared by the m09, m10
    * and d22 oracles so the modalities can never drift.
    */
  private[graft] def hammingTailSql(outA: String, outB: String): String =
    s"""${hammingCandSql(outA, outB)},
       pairs AS (
         SELECT c.$outA, c.$outB,
           bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) AS hamming
         FROM cand c JOIN codes x ON x.id = c.$outA
                     JOIN codes y ON y.id = c.$outB)
       SELECT CAST($outA AS BIGINT) AS $outA, CAST($outB AS BIGINT) AS $outB,
         CAST(hamming AS BIGINT) AS hamming
       FROM pairs WHERE hamming <= 3 ORDER BY $outA, $outB"""
}
