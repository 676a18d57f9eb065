package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal binary columns: header metadata, features, pixel decode,
  * and the AV-sampling stub's plumbing.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("multimodal-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def makeImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  private def makeWav(channels: Int, rate: Int, bits: Int, samples: Array[Int]): Array[Byte] = {
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
    samples.foreach { s => if (bits == 16) out.putShort(s.toShort) else out.put(s.toByte) }
    out.array()
  }

  test("audioMetaOf parses WAV containers; rejects non-WAV") {
    val m = Multimodal.audioMetaOf(makeWav(2, 44100, 16, new Array[Int](882)))
    assert(m == Multimodal.AudioMeta("wav", 2, 44100, 16, 441, 0.01))
    assert(Multimodal.audioMetaOf("RIFFxxxxNOPE".getBytes.padTo(48, 0.toByte)) == null)
    assert(Multimodal.audioMetaOf(null) == null)
    assert(Multimodal.audioMetaOf(Array[Byte](1, 2, 3)) == null)
  }

  test("audioMetaOf walks past a LIST chunk before fmt/data") {
    // RIFF + LIST(4 bytes payload) + fmt + data
    val base = makeWav(1, 8000, 16, Array(1, 2, 3, 4))
    val withList = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    withList.put(base, 0, 12)
    withList.put("LIST".getBytes); withList.putInt(4); withList.put("INFO".getBytes)
    withList.put(base, 12, base.length - 12)
    val m = Multimodal.audioMetaOf(withList.array())
    assert(m != null && m.nFrames == 4 && m.sampleRate == 8000)
  }

  test("audioStatsOf: square wave has peak == rms == meanAbs") {
    val sq = Array.tabulate(800)(i => if ((i / 4) % 2 == 0) 5000 else -5000)
    val st = Multimodal.audioStatsOf(makeWav(1, 8000, 16, sq))
    assert(st == Multimodal.AudioStats(5000, 5000.0, 5000.0))
    // silence
    assert(Multimodal.audioStatsOf(makeWav(1, 8000, 16, new Array[Int](32))) ==
      Multimodal.AudioStats(0, 0.0, 0.0))
    // 8-bit: stats are 16-bit-only -> null
    assert(Multimodal.audioStatsOf(makeWav(1, 8000, 8, Array.fill(64)(128))) == null)
  }

  test("audioWindowsOf: windowed peak/rms/zcr with independent windows") {
    // period-8 square over 1000 frames, window 400: two full windows
    // (99 in-window sign flips each) and a 200-frame tail (49 flips)
    val sq = Array.tabulate(1000)(i => if ((i / 4) % 2 == 0) 6000 else -6000)
    val ws = Multimodal.audioWindowsOf(makeWav(1, 8000, 16, sq), 400)
    assert(ws == Seq(
      Multimodal.AudioWindow(0, 400, 6000.0, 6000.0, 0.2475),
      Multimodal.AudioWindow(1, 400, 6000.0, 6000.0, 0.2475),
      Multimodal.AudioWindow(2, 200, 6000.0, 6000.0, 0.245)))
    // stereo mixdown: L = +4000, R = -4000 averages to silence
    val stereo = Array.tabulate(200)(i => if (i % 2 == 0) 4000 else -4000)
    val sws = Multimodal.audioWindowsOf(makeWav(2, 8000, 16, stereo), 50)
    assert(sws == Seq(
      Multimodal.AudioWindow(0, 50, 0.0, 0.0, 0.0),
      Multimodal.AudioWindow(1, 50, 0.0, 0.0, 0.0)))
    // non-16-bit and corrupt payloads are null, not empty
    assert(Multimodal.audioWindowsOf(makeWav(1, 8000, 8, Array.fill(64)(128)), 50) == null)
    assert(Multimodal.audioWindowsOf("nope".getBytes, 50) == null)
  }

  test("gifFrameStatsOf samples evenly spaced frames of an animated gif") {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 4).foreach { k =>
      val img = new BufferedImage(6, 3, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 3; x <- 0 until 6) img.setRGB(x, y, k * 50 << 16)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val frames = Multimodal.gifFrameStatsOf(out.toByteArray, 2)
    assert(frames.map(_.frameIndex) == Seq(0, 2))
    assert(frames.map(_.meanR) == Seq(0.0, 100.0))
    assert(frames.forall(f => f.width == 6 && f.height == 3))
    // single-frame gif: one frame; garbage: null
    assert(Multimodal.gifFrameStatsOf(makeImage(5, 5, 0x0000ff, "gif"), 3)
      .map(_.frameIndex) == Seq(0))
    assert(Multimodal.gifFrameStatsOf("nope".getBytes, 3) == null)
  }

  private def bmffBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(len)
    out.putInt(len).put(typ.getBytes)
    payload.foreach(out.put)
    out.array()
  }

  test("mp4MetaOf: v0 boxes, 64-bit largesize mdat, audio-only, corrupt") {
    // v1 boxes and the query-shape coverage live in m04's oracle-gated
    // fixtures; here probe the raw parser edges.
    // hand-rolled: ftyp + moov(mvhd v0 ts=600 dur=1200, trak(tkhd 320x240))
    def mvhd0(ts: Int, dur: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      b.array()
    }
    def tkhd0(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.position(76); b.putInt(w << 16).putInt(h << 16)
      b.array()
    }
    val ftyp = bmffBox("ftyp", "isom".getBytes, new Array[Byte](4), "isom".getBytes)
    val moov = bmffBox("moov", bmffBox("mvhd", mvhd0(600, 1200)),
      bmffBox("trak", bmffBox("tkhd", tkhd0(320, 240))))
    // a 64-bit-size mdat box (size field == 1, largesize followup)
    val mdat64 = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putInt(1).put("mdat".getBytes).putLong(24L).put(new Array[Byte](8))
      b.array()
    }
    val m = Multimodal.mp4MetaOf(ftyp ++ mdat64 ++ moov)
    assert(m != null && m.brand == "isom" && m.timescale == 600L)
    assert(m.durationS == 2.0 && m.nTracks == 1)
    assert(m.width.contains(320) && m.height.contains(240))
    // truncated moov: parse must stop cleanly, keeping the brand
    val trunc = Multimodal.mp4MetaOf(ftyp ++ moov.take(moov.length - 30))
    assert(trunc != null && trunc.brand == "isom")
    assert(Multimodal.mp4MetaOf("not a container at all......".getBytes) == null)
    assert(Multimodal.mp4MetaOf(null) == null)
  }

  test("imageMetaOf parses png/gif/bmp/jpeg headers") {
    assert(Multimodal.imageMetaOf(makeImage(31, 17, 0x123456, "png")) ==
      Multimodal.ImageMeta("png", 31, 17))
    assert(Multimodal.imageMetaOf(makeImage(12, 34, 0xff0000, "gif")) ==
      Multimodal.ImageMeta("gif", 12, 34))
    assert(Multimodal.imageMetaOf(makeImage(8, 9, 0x00ff00, "bmp")) ==
      Multimodal.ImageMeta("bmp", 8, 9))
    assert(Multimodal.imageMetaOf(makeImage(20, 10, 0x888888, "jpg")) ==
      Multimodal.ImageMeta("jpeg", 20, 10))
    assert(Multimodal.imageMetaOf("not an image at all".getBytes) == null)
  }

  test("binary media columns flow through a DataFrame with typed metadata") {
    val ss = spark; import ss.implicits._
    val rows = Seq(
      (1L, makeImage(31, 17, 0x406080, "png")),
      (2L, makeImage(5, 5, 0xffffff, "gif")),
      (3L, "junk-bytes".getBytes))
    val df = rows.toDF("media_id", "payload")
    val out = df.select(col("media_id"),
        Multimodal.imageMeta(col("payload")).as("meta"),
        Multimodal.byteHistogram(col("payload"), 16).as("features"))
      .orderBy("media_id").collect()
    assert(out(0).getStruct(1).getString(0) == "png")
    assert(out(0).getStruct(1).getInt(1) == 31 && out(0).getStruct(1).getInt(2) == 17)
    assert(out(1).getStruct(1).getString(0) == "gif")
    assert(out(2).isNullAt(1)) // junk -> null metadata, no task failure
    out.foreach { r =>
      val feats = r.getSeq[Double](2)
      assert(feats.size == 16)
      assert(math.abs(feats.sum - 1.0) < 1e-3)
    }
  }

  test("pixel decode via ImageIO: dimensions and mean color") {
    val ss = spark; import ss.implicits._
    val df = Seq((1L, makeImage(10, 10, 0x405060, "png"))).toDF("id", "payload")
    val st = df.select(Multimodal.pixelStats(col("payload")).as("s")).head.getStruct(0)
    assert(st.getInt(0) == 10 && st.getInt(1) == 10)
    assert(st.getDouble(2) == 0x40.toDouble)
    assert(st.getDouble(3) == 0x50.toDouble)
    assert(st.getDouble(4) == 0x60.toDouble)
  }

  test("aviMjpegFramesOf: RIFF walk + real JPEG decode; corrupt input -> null") {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes).putInt(data.length).put(data).array()
    }
    val jpegs = Seq(0x404040, 0x808080).map(c => makeImage(6, 4, c, "jpg"))
    // frames nested inside a 'rec ' list exercise the recursive walk
    val movi = chunk("LIST", "movi".getBytes ++
      chunk("00dc", jpegs(0)) ++
      chunk("LIST", "rec ".getBytes ++ chunk("00dc", jpegs(1))))
    val avi = chunk("RIFF", "AVI ".getBytes ++ movi)
    val frames = Multimodal.aviMjpegFramesOf(avi, 4)
    assert(frames.length == 2)
    assert(frames.map(_.frameIndex) == Seq(0, 1))
    assert(frames.forall(f => f.width == 6 && f.height == 4))
    // gray JPEG round-trips exactly (Cb = Cr = 128)
    assert(frames(1).meanR == 128.0 && frames(1).meanG == 128.0 &&
      frames(1).meanB == 128.0)
    assert(Multimodal.aviMjpegFramesOf("not avi".getBytes, 4) == null)
    assert(Multimodal.aviMjpegFramesOf(
      chunk("RIFF", "AVI ".getBytes ++ chunk("LIST", "movi".getBytes)), 4) == null)
    // a truncated container must not throw (result may be null or partial)
    Multimodal.aviMjpegFramesOf(avi.take(avi.length - 10), 4)
  }

  test("aviMjpegFramesOf never throws: random bytes and all truncations") {
    val rnd = new scala.util.Random(42)
    // random garbage, some with a plausible RIFF/AVI prelude
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(400)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      if (i % 3 == 0 && len >= 12) {
        "RIFF".getBytes.copyToArray(bytes, 0)
        if (i % 6 == 0) "AVI ".getBytes.copyToArray(bytes, 8)
      }
      Multimodal.aviMjpegFramesOf(bytes, 3) // must not throw
    }
    // every truncation prefix of a VALID container must not throw
    val jpeg = makeImage(4, 4, 0x808080, "jpg")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes).putInt(data.length).put(data).array()
    }
    val avi = chunk("RIFF", "AVI ".getBytes ++
      chunk("LIST", "movi".getBytes ++ chunk("00dc", jpeg)))
    (0 to avi.length).foreach(n => Multimodal.aviMjpegFramesOf(avi.take(n), 3))
  }

  test("bandedHammingPairs == brute force over 990 random codes with " +
      "planted 0-3-bit near-dups (pigeonhole recall is exact)") {
    val rnd = new scala.util.Random(2026)
    val base = (0 until 900).map(i =>
      (i.toLong, rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
    val planted = (0 until 90).map { k =>
      val (_, h0, h1) = base(rnd.nextInt(900))
      var (m0, m1) = (h0, h1)
      (0 until rnd.nextInt(4)).foreach { _ =>
        val b = rnd.nextInt(64)
        if (b < 32) m0 ^= 1L << b else m1 ^= 1L << (b - 32)
      }
      (1000L + k, m0, m1)
    }
    val all = base ++ planted
    val df = spark.createDataFrame(all).toDF("id", "h0", "h1")
    val got = graft.queries.Multimodal.bandedHammingPairs(df, "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      i <- all.indices
      j <- (i + 1) until all.length
      h = java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) +
        java.lang.Long.bitCount(all(i)._3 ^ all(j)._3)
      if h <= 3
    } yield (all(i)._1 min all(j)._1, all(i)._1 max all(j)._1, h.toLong)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("jpegDhashOf / audioFingerprintOf never throw: random bytes and " +
      "all truncations of valid payloads") {
    import graft.queries.{Multimodal => Q}
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { i =>
      val len = rnd.nextInt(500)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      if (i % 3 == 0 && len >= 12) {
        // plausible preludes: JPEG SOI / RIFF WAVE
        if (i % 6 == 0) { bytes(0) = 0xFF.toByte; bytes(1) = 0xD8.toByte }
        else {
          "RIFF".getBytes.copyToArray(bytes, 0)
          "WAVE".getBytes.copyToArray(bytes, 8)
        }
      }
      Multimodal.jpegDhashOf(bytes)          // must not throw
      Multimodal.audioFingerprintOf(bytes, 400)
    }
    val jpeg = Q.craftGrayJpeg2D(Q.m09Grids.head._2)
    (0 to jpeg.length by 13).foreach(n => Multimodal.jpegDhashOf(jpeg.take(n)))
    val wav = Q.makeWav(1, 8000, 16, Q.squareSamples(Q.m10Amps.head._2, 400))
    (0 to wav.length by 997).foreach(n =>
      Multimodal.audioFingerprintOf(wav.take(n), 400))
  }

  test("imageResizeOf: exact box averages on the crafted grid; " +
      "upscale/garbage -> null") {
    import graft.queries.{Multimodal => Q}
    val g = Q.m09Grids.head._2
    val j = Q.craftGrayJpeg2D(g)
    val t8 = Multimodal.imageResizeOf(j, 8, 8)
    assert(t8.length == 64)
    t8.foreach(p => assert(p.gray == 128.0 + g(p.y)(p.x)))
    val t4 = Multimodal.imageResizeOf(j, 4, 4)
    assert(t4.length == 16)
    t4.foreach { p =>
      val quad = Seq(g(p.y * 2)(p.x * 2), g(p.y * 2)(p.x * 2 + 1),
        g(p.y * 2 + 1)(p.x * 2), g(p.y * 2 + 1)(p.x * 2 + 1))
      assert(p.gray == 128.0 + quad.sum / 4.0)
    }
    // a 1x1 "resize" is the global mean
    val t1 = Multimodal.imageResizeOf(j, 1, 1)
    assert(t1 == Seq(Multimodal.ResizedPixel(0, 0,
      math.rint((128.0 + g.flatten.sum / 64.0) * 1e6) / 1e6)))
    assert(Multimodal.imageResizeOf(j, 128, 128) == null) // upscale: out of scope
    assert(Multimodal.imageResizeOf("junk".getBytes, 4, 4) == null)
    assert(Multimodal.imageResizeOf(null, 4, 4) == null)
  }

  test("aviFrameDhashesOf: sample-position indexing, per-frame hashes " +
      "match jpegDhashOf, null on garbage and undecodable frames") {
    import graft.queries.{Multimodal => Q}
    val clips = Q.m11Clips.toMap
    def avi(grids: Seq[Seq[Seq[Int]]]) =
      Q.makeAvi(64, 64, 40000, grids.map(Q.craftGrayJpeg2D))
    val fhs = Multimodal.aviFrameDhashesOf(avi(clips(1)), 4)
    assert(fhs.map(_.frameIndex) == Seq(0, 1, 2, 3))
    clips(1).zipWithIndex.foreach { case (g, k) =>
      val want = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(g))
      assert(fhs(k).h0 == want.h0 && fhs(k).h1 == want.h1)
    }
    // 6-frame clip sampled at 4: positions re-index 0..3, frames 0,1,3,4
    val six = avi(clips(1) ++ clips(4).take(2))
    assert(Multimodal.aviFrameDhashesOf(six, 4).map(_.frameIndex) == Seq(0, 1, 2, 3))
    assert(Multimodal.aviFrameDhashesOf("nope".getBytes, 4) == null)
    assert(Multimodal.aviFrameDhashesOf(null, 4) == null)
  }

  test("mp3MetaOf: frame walk, ID3 skip, lost sync, never throws") {
    def frame(header: Array[Int], len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      header.indices.foreach(j => f(j) = header(j).toByte)
      f
    }
    // 2 frames MPEG1 L3 128kbps 44.1kHz stereo (frameLen 417)
    val h1 = Array(0xff, 0xfb, 0x90, 0x00)
    val two = frame(h1, 417) ++ frame(h1, 417)
    val m = Multimodal.mp3MetaOf(two)
    assert(m.version == "mpeg1" && m.bitrateKbps == 128 &&
      m.sampleRate == 44100 && m.channels == 2 && m.nFrames == 2L && !m.hasId3)
    // ID3v2 prefix is skipped (syncsafe length 130 = 0x01 0x02)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 2) ++
      new Array[Byte](130)
    val tagged = Multimodal.mp3MetaOf(tag ++ frame(h1, 417))
    assert(tagged.hasId3 && tagged.nFrames == 1L)
    // ID3v2.4 footer flag (0x10): size excludes header AND footer
    val footTag = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 1, 2) ++
      new Array[Byte](130) ++ "3DI footer".getBytes.take(10)
    val footed = Multimodal.mp3MetaOf(footTag ++ frame(h1, 417))
    assert(footed != null && footed.hasId3 && footed.nFrames == 1L)
    // lost sync mid-stream: counted frames stand, garbage tail ignored
    val torn = Multimodal.mp3MetaOf(frame(h1, 417) ++ "junk tail".getBytes)
    assert(torn.nFrames == 1L)
    // truncated final frame still counts it (header was valid)
    assert(Multimodal.mp3MetaOf(two.take(500)).nFrames == 2L)
    // garbage / empty / every truncation: null or a value, never a throw
    assert(Multimodal.mp3MetaOf("not audio".getBytes) == null)
    assert(Multimodal.mp3MetaOf(Array.empty[Byte]) == null)
    (0 to two.length).foreach(n => Multimodal.mp3MetaOf(two.take(n)))
    (0 until 64).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      Multimodal.mp3MetaOf(Array.fill(rnd.nextInt(600))(rnd.nextInt().toByte))
    }
  }

  test("jpegPixelGridOf: crafted DC-only JPEG decodes to the hand-derived " +
      "values; corrupt/non-JPEG input -> null; never throws") {
    val j = graft.queries.Multimodal.craftGrayJpeg(Seq(-100, -50, 50, 100))
    val grid = Multimodal.jpegPixelGridOf(j, 4)
    assert(grid.size == 16)
    // w=32: xs {0,10,20,31} -> blocks 0..3 -> 28/78/178/228 exactly
    assert(grid.map(p => (p.x, p.r)).distinct.sortBy(_._1) ==
      Seq((0, 28), (10, 78), (20, 178), (31, 228)))
    assert(grid.forall(p => p.r == p.g && p.g == p.b))
    // a 1x1 grid samples the origin only
    assert(Multimodal.jpegPixelGridOf(j, 1) ==
      Seq(Multimodal.PixelSample(0, 0, 28, 28, 28)))
    assert(Multimodal.jpegPixelGridOf("nope".getBytes, 2) == null)
    assert(Multimodal.jpegPixelGridOf(null, 2) == null)
    // truncations of a valid JPEG: null or a decoded grid, never a throw
    (2 until j.length by 7).foreach(k => Multimodal.jpegPixelGridOf(j.take(k), 2))
    // color path still exercised (PNG -> getRGB branch)
    val png = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, 0x336699)))
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray
    }
    assert(Multimodal.jpegPixelGridOf(png, 2) == null) // not a JPEG: SOI gate
  }

  test("jpegDhashOf: hand-derivable hash over a crafted 2-D grid; " +
      "mutations flip exactly the constructed bits; garbage -> null") {
    import graft.queries.{Multimodal => Q}
    val grids = Q.m09Grids.toMap
    val h1 = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(grids(1)))
    val h2 = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(grids(2)))
    val h3 = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(grids(3)))
    val h5 = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(grids(5)))
    val h6 = Multimodal.jpegDhashOf(Q.craftGrayJpeg2D(grids(6)))
    def ham(a: Multimodal.DHash, b: Multimodal.DHash): Int =
      java.lang.Long.bitCount(a.h0 ^ b.h0) + java.lang.Long.bitCount(a.h1 ^ b.h1)
    assert(h1 == h2)                       // identical bytes, identical hash
    assert(ham(h1, h3) == 1)               // (5,7) mutation = bit 47 only
    assert((h1.h1 ^ h3.h1) == (1L << 15) && h1.h0 == h3.h0)
    assert(ham(h5, h6) == 1)               // (3,7) mutation = bit 31 only
    assert((h5.h0 ^ h6.h0) == (1L << 31) && h5.h1 == h6.h1)
    // halves never touch the sign bit (each packs 32 bits unsigned)
    Seq(h1, h3, h5, h6).foreach { h =>
      assert(h.h0 >= 0 && h.h0 <= 0xFFFFFFFFL && h.h1 >= 0 && h.h1 <= 0xFFFFFFFFL)
    }
    // checkerboard row 0: cols sampled [0,0,1..7], px = 128 + (c%2)*60-30
    // -> comparisons: eq,0<1: 0; then alternating 1,0,...  => bits 2,4,6
    assert((h1.h0 & 0xFFL) === ((1L << 2) | (1L << 4) | (1L << 6)))
    assert(Multimodal.jpegDhashOf("garbage".getBytes) == null)
    assert(Multimodal.jpegDhashOf(null) == null)
  }

  test("audioFingerprintOf: end-window mutations flip exactly bits 63/0; " +
      "short, 8-bit, and garbage payloads -> null") {
    import graft.queries.{Multimodal => Q}
    val amps = Q.m10Amps.toMap
    def fp(id: Int) = Multimodal.audioFingerprintOf(Q.makeWav(1, 8000, 16,
      Q.squareSamples(amps(id), 400)), 400)
    val (f1, f2, f3, f4, f5, f6) = (fp(1), fp(2), fp(3), fp(4), fp(5), fp(6))
    assert(f1 == f2)
    assert(f1.h0 == f3.h0 && (f1.h1 ^ f3.h1) == (1L << 31)) // bit 63 only
    assert((f1.h0 ^ f4.h0) == 1L && (f1.h1 ^ f4.h1) == (1L << 31)) // bits 0+63
    assert(f5.h1 != f6.h1 || f5.h0 != f6.h0)
    assert(java.lang.Long.bitCount(f5.h0 ^ f6.h0) +
      java.lang.Long.bitCount(f5.h1 ^ f6.h1) == 1)
    // 64 windows only -> too short for 64 deltas -> null
    assert(Multimodal.audioFingerprintOf(Q.makeWav(1, 8000, 16,
      Q.squareSamples(amps(1).take(64), 400)), 400) == null)
    assert(Multimodal.audioFingerprintOf(Q.makeWav(1, 8000, 8,
      Array.fill(800)(128)), 400) == null)
    assert(Multimodal.audioFingerprintOf("nope".getBytes, 400) == null)
    assert(Multimodal.audioFingerprintOf(null, 400) == null)
  }

  test("av frame-sample stub: deterministic offsets, real plumbing") {
    val ss = spark; import ss.implicits._
    val payload = (0 until 1000).map(_.toByte).toArray
    val df = Seq((1L, payload)).toDF("id", "payload")
    val frames = df.select(Multimodal.avFrameSample(col("payload"), 4, 16).as("f"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(frames.size == 4)
    assert(frames.map(_.getLong(0)) == Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.getAs[Array[Byte]](1).length == 16))
  }

  test("imageDhashOf: PNG/BMP/GIF re-saves of a grid hash IDENTICALLY to " +
    "the crafted JPEG (GIF exercises the palette-index luma path); junk " +
    "and WebP magic return null; jpegDhashOf agrees on JPEG bytes") {
    import graft.queries.{Multimodal => Q}
    import graft.functions.{Multimodal => M}
    for ((_, grid) <- Q.m09Grids.take(3)) {
      val jpeg = M.jpegDhashOf(Q.craftGrayJpeg2D(grid))
      assert(jpeg != null)
      for (fmt <- Seq("png", "bmp", "gif")) {
        val got = M.imageDhashOf(Q.makeGrayImage(grid, fmt))
        assert(got == jpeg, s"format $fmt diverged")
      }
      assert(M.imageDhashOf(Q.craftGrayJpeg2D(grid)) == jpeg)
    }
    assert(M.imageDhashOf("definitely not an image".getBytes) == null)
    assert(M.imageDhashOf(null) == null)
    // a minimal WebP header sniffs as webp and is declined (no JDK reader)
    val webp = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++ "WEBPVP8 ".getBytes ++
      Array.fill[Byte](14)(0)
    assert(M.imageDhashOf(webp) == null)
  }
}
