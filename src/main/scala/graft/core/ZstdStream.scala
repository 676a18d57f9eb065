package graft.core

import java.io.{IOException, InputStream, OutputStream}
import com.github.luben.zstd.{Zstd, ZstdCompressCtx, ZstdDecompressCtx, ZstdDictTrainer, ZstdInputStreamNoFinalizer}

/** `.warc.zst` framing (RFC 8878 + the wget/IIPC zstd-WARC convention):
  * an archive is concatenated zstd frames — one or more records per
  * frame — optionally led by a SKIPPABLE frame whose content is a
  * decompression dictionary, either raw (`0xEC30A437` magic) or itself
  * zstd-compressed (wget writes both forms). Frame boundaries are the
  * seek points, the zstd analog of multi-member gzip.
  *
  * NOT a reference capability (fastwarc reads gzip/LZ4 only,
  * fastwarc/stream_io.pyx:890-917) — a scale-path extension: zstd
  * decodes several times faster than gzip at similar ratios, and the
  * ecosystem is moving crawl archives to it (wget ≥1.21 writes
  * `.warc.zst`; pywb reads it).
  */
object ZstdWarc {
  val FrameMagic = 0xFD2FB528
  val SkippableMin = 0x184D2A50 // low nibble free: 0x184D2A50..5F
  val DictMagic = 0xEC30A437

  def isSkippable(magic: Int): Boolean = (magic & 0xFFFFFFF0) == SkippableMin

  /** Max compressed bytes collected for a one-shot frame decompress;
    * past this the reader degrades to a streaming decode (correct,
    * just no member boundaries from that point). Real `.warc.zst`
    * frames are record-sized — this guards against a monolithic
    * single-frame archive buffering itself into the heap.
    */
  val MaxOneShotFrame: Int = 192 << 20
  /** Max decompressed bytes for the one-shot path (same degradation).
    * Also the bomb guard: a frame may DECLARE any content size in its
    * header — a crafted archive declaring gigabytes per frame must not
    * make every reader allocate them up front (the MemGuard doctrine:
    * one pathological input costs bounded memory, never an executor).
    * Past this the decode degrades to the streaming path, which
    * allocates window-sized buffers regardless of declared size.
    */
  val MaxOneShotContent: Long = 256L << 20
  /** Max dictionary skippable-frame content (libzstd dicts are ~100 KiB;
    * 8 MiB is generous). Larger first skippable frames are skipped as
    * ordinary padding, not treated as dictionaries.
    */
  val MaxDictBytes: Int = 8 << 20

  /** Decode a skippable-frame content into a dictionary: raw structured
    * (DictMagic-led) bytes verbatim; a zstd frame decompressed to the
    * dictionary (wget's compressed-dict form — whatever the
    * decompressed bytes are, they ARE the dictionary by convention);
    * anything else → None (ordinary padding, not a dictionary).
    */
  def dictionaryFrom(content: Array[Byte]): Option[Array[Byte]] = {
    def le32At(a: Array[Byte], o: Int) = (a(o) & 0xff) |
      ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) |
      ((a(o + 3) & 0xff) << 24)
    if (content.length < 4) None
    else if (le32At(content, 0) == DictMagic) Some(content)
    else if (le32At(content, 0) == FrameMagic) {
      // compressed dictionary: decompress bounded
      val zin = new ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(content))
      try {
        val out = new java.io.ByteArrayOutputStream(64 << 10)
        val buf = new Array[Byte](64 << 10)
        var n = zin.read(buf)
        while (n >= 0 && out.size <= MaxDictBytes) {
          out.write(buf, 0, n); n = zin.read(buf)
        }
        val d = out.toByteArray
        if (d.length >= 4 && d.length <= MaxDictBytes) Some(d) else None
      } catch { case _: IOException => None }
      finally zin.close()
    } else None
  }

  /** Read the archive-head dictionary (if the file starts with a
    * dictionary skippable frame) from a stream positioned at byte 0 —
    * the per-partition preset a member-indexed scan needs before
    * seeking into the middle of a dict-compressed archive.
    */
  def readDictionary(in: InputStream): Option[Array[Byte]] = {
    def le32(): Int = {
      val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
      if (d < 0) return -1
      a | (b << 8) | (c << 16) | (d << 24)
    }
    val magic = le32()
    if (magic == -1 || !isSkippable(magic)) return None
    val size = le32()
    if (size < 4 || size > MaxDictBytes) return None
    val content = new Array[Byte](size)
    var off = 0
    while (off < size) {
      val n = in.read(content, off, size - off)
      if (n < 0) return None
      off += n
    }
    dictionaryFrom(content)
  }
}

/** Multi-frame zstd reader with member tracking — the `.warc.zst`
  * counterpart of [[GzipMemberInputStream]] / [[Lz4FrameInputStream]]:
  * `memberListener(compressedFrameStart, decompressedBytesBefore)`
  * fires as the decode crosses each DATA frame, feeding the
  * member-index side-output and the member-indexed scan's offset
  * rebase.
  *
  * Fast path: each frame's compressed bytes are collected by walking
  * the explicit block sizes (no speculative decompression — boundaries
  * are PROVEN by the format) and decompressed one-shot through ONE
  * reused native [[ZstdDecompressCtx]]; a fresh native stream per
  * frame would be allocation-bound at record-per-frame granularity
  * (the gzip per-member lesson). Frames without a declared content
  * size, or beyond [[ZstdWarc.MaxOneShotFrame]], degrade to a
  * streaming decode of the remaining stream — correct output, member
  * callbacks stop (a partial sidecar still parallelizes the indexed
  * prefix; sparse indexes are legal by design).
  *
  * `presetDict` seeds the dictionary for partitions seeking into the
  * middle of a dict-compressed archive; when reading from byte 0 the
  * leading skippable dictionary frame is picked up automatically.
  */
final class ZstdFrameInputStream(in: InputStream,
    memberListener: (Long, Long) => Unit = null,
    presetDict: Array[Byte] = null) extends InputStream {

  import ZstdWarc._

  private var compressedPos = 0L
  private var decompressedPos = 0L
  private var dict: Array[Byte] = presetDict
  private var sawDataFrame = false
  private var finishedAll = false

  private val ctx = new ZstdDecompressCtx()
  private var ctxDict: Array[Byte] = null // dict currently loaded in ctx
  private var frameBuf = new Array[Byte](64 << 10)
  private var outBuf: Array[Byte] = Array.emptyByteArray
  private var outLo = 0
  private var outHi = 0
  private var fallback: InputStream = null
  private var closed = false

  // ---- raw-stream helpers (byte accounting in compressedPos) --------

  /** -1 at clean EOF before the first byte; IOException on truncation
    * mid-value.
    */
  private def readLE32OrEof(): Int = {
    val a = in.read()
    if (a < 0) return -1
    val b = in.read(); val c = in.read(); val d = in.read()
    if (d < 0) throw new IOException(
      s"truncated zstd frame magic at offset $compressedPos")
    compressedPos += 4
    a | (b << 8) | (c << 16) | (d << 24)
  }

  private def collect(len: Int, at: Int): Int = {
    val need = at + len
    if (need > MaxOneShotFrame) return -1 // oversize → caller degrades
    if (need > frameBuf.length) {
      var cap = frameBuf.length
      while (cap < need) cap <<= 1
      frameBuf = java.util.Arrays.copyOf(frameBuf, math.min(cap, MaxOneShotFrame))
    }
    var off = at
    while (off < need) {
      val n = in.read(frameBuf, off, need - off)
      if (n < 0) throw new IOException(
        s"truncated zstd frame at offset $compressedPos (${off - at} of $len frame bytes)")
      off += n
      compressedPos += n
    }
    need
  }

  private def le32(o: Int): Int = (frameBuf(o) & 0xff) |
    ((frameBuf(o + 1) & 0xff) << 8) | ((frameBuf(o + 2) & 0xff) << 16) |
    ((frameBuf(o + 3) & 0xff) << 24)

  // ---- frame advance -------------------------------------------------

  /** Bytes decompressed by [[nextFrame]] straight into the caller's
    * buffer (bypassing outBuf — saves a full memcpy of every
    * decompressed byte when the caller reads in frame-sized-or-larger
    * chunks, which [[WarcByteReader]]'s 64 KiB fills do for
    * record-per-frame archives).
    */
  private var directN = 0

  /** Collect the next DATA frame into frameBuf and decompress it —
    * straight into `target` when the declared content fits in
    * `targetLen` (sets [[directN]]), else into outBuf; handles
    * skippable frames (dictionary at the head) along the way. Sets
    * finishedAll at clean EOF. Switches to `fallback` on oversize /
    * unknown-content-size frames.
    */
  private def nextFrame(target: Array[Byte], targetOff: Int, targetLen: Int): Unit = {
    while (outLo >= outHi && directN == 0 && !finishedAll && fallback == null) {
      val frameStart = compressedPos
      val magic = readLE32OrEof()
      if (magic == -1) { finishedAll = true; return }
      if (isSkippable(magic)) {
        var filled = collect(4, 0)
        if (filled < 0) throw new IOException(
          s"unreasonable zstd skippable frame at offset $frameStart")
        val size = le32(0)
        if (size < 0) throw new IOException(
          s"bad zstd skippable frame size at offset $frameStart")
        if (!sawDataFrame && dict == null && size >= 4 && size <= MaxDictBytes) {
          filled = collect(size, 0)
          dict = dictionaryFrom(java.util.Arrays.copyOf(frameBuf, size)).orNull
        } else {
          // plain padding: consume without retaining
          var left = size.toLong
          val sink = new Array[Byte](64 << 10)
          while (left > 0) {
            val n = in.read(sink, 0, math.min(left, sink.length.toLong).toInt)
            if (n < 0) throw new IOException(
              s"truncated zstd skippable frame at offset $frameStart")
            left -= n
            compressedPos += n
          }
        }
      } else if (magic == FrameMagic) {
        if (memberListener != null)
          memberListener(frameStart, decompressedPos)
        sawDataFrame = true
        // re-materialize the magic for the decompressor
        frameBuf(0) = 0x28; frameBuf(1) = 0xB5.toByte
        frameBuf(2) = 0x2F; frameBuf(3) = 0xFD.toByte
        var filled = collect(1, 4) // frame header descriptor
        if (filled < 0) { degrade(4, frameStart); return }
        val desc = frameBuf(4) & 0xff
        if ((desc & 0x08) != 0) throw new IOException(
          s"reserved zstd frame-descriptor bit set at offset $frameStart")
        val fcsFlag = (desc >> 6) & 3
        val single = (desc & 0x20) != 0
        val didLen = Array(0, 1, 2, 4)((desc & 3))
        val fcsLen = fcsFlag match {
          case 0 => if (single) 1 else 0
          case 1 => 2
          case 2 => 4
          case _ => 8
        }
        val winLen = if (single) 0 else 1
        filled = collect(winLen + didLen + fcsLen, filled)
        if (filled < 0) { degrade(5, frameStart); return }
        // declared content size straight from the header bytes (RFC 8878
        // §3.1.1.1.2): a JNI Zstd.getFrameContentSize call per frame was
        // measurable at record-per-frame granularity. -1 = not declared.
        val contentSize: Long =
          if (fcsLen == 0) -1L
          else {
            val o = 5 + winLen + didLen
            fcsLen match {
              case 1 => frameBuf(o) & 0xffL
              case 2 => ((frameBuf(o) & 0xffL) |
                ((frameBuf(o + 1) & 0xffL) << 8)) + 256L
              case 4 => le32(o) & 0xFFFFFFFFL
              case _ => (le32(o) & 0xFFFFFFFFL) | (le32(o + 4).toLong << 32)
            }
          }
        // blocks: 3-byte headers with explicit sizes
        var last = false
        var ok = true
        while (!last && ok) {
          val at = filled
          filled = collect(3, filled)
          if (filled < 0) { degrade(at, frameStart); return }
          val bh = (frameBuf(at) & 0xff) | ((frameBuf(at + 1) & 0xff) << 8) |
            ((frameBuf(at + 2) & 0xff) << 16)
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 3
          val bsize = bh >>> 3
          if (btype == 3) throw new IOException(
            s"reserved zstd block type in frame at offset $frameStart")
          val payload = if (btype == 1) 1 else bsize
          val at2 = filled
          filled = collect(payload, filled)
          if (filled < 0) { degrade(at2, frameStart); ok = false }
        }
        if (!ok) return
        if ((desc & 0x04) != 0) { // content checksum
          val at = filled
          filled = collect(4, filled)
          if (filled < 0) { degrade(at, frameStart); return }
        }
        // one-shot decompress through the reused ctx
        if (contentSize < 0 || contentSize > MaxOneShotContent) {
          degrade(filled, frameStart); return
        }
        if (contentSize > 0) {
          if (!java.util.Arrays.equals(ctxDict, dict)) {
            ctx.loadDict(dict) // null unloads
            ctxDict = dict
          }
          def decomp(dst: Array[Byte], dstOff: Int): Int =
            try ctx.decompressByteArray(dst, dstOff, contentSize.toInt,
              frameBuf, 0, filled)
            catch { case e: com.github.luben.zstd.ZstdException =>
              throw new IOException(
                s"zstd frame at offset $frameStart failed to decode: ${e.getMessage}")
            }
          if (target != null && contentSize <= targetLen) {
            directN = decomp(target, targetOff)
          } else {
            if (outBuf.length < contentSize)
              outBuf = new Array[Byte](contentSize.toInt)
            outLo = 0
            outHi = decomp(outBuf, 0)
          }
        }
        // contentSize == 0 (empty frame): loop for the next frame
      } else {
        throw new IOException(
          f"bad zstd frame magic 0x$magic%08x at offset $frameStart")
      }
    }
  }

  /** Switch to a streaming decode of [frameBuf prefix ++ rest of `in`]
    * — the oversize / no-content-size escape hatch. Member callbacks
    * stop; output remains byte-exact. Deliberately NOT continuous
    * mode: continuous would return clean EOF mid-frame on a truncated
    * archive (records after the cut silently lost); the default mode
    * throws "Truncated source" there, matching the one-shot path's
    * truncation doctrine, and a COMPLETE stream already reads to clean
    * EOF without it (libzstd's streaming decode also skips any later
    * skippable padding frames itself).
    */
  private def degrade(buffered: Int, frameStart: Long): Unit = {
    val pre = new java.io.ByteArrayInputStream(frameBuf, 0, buffered)
    val seq = new java.io.SequenceInputStream(pre, in)
    val z = new ZstdInputStreamNoFinalizer(seq)
    if (dict != null) z.setDict(dict)
    fallback = z
  }

  // ---- InputStream ---------------------------------------------------

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (fallback != null) {
      val n = fallback.read(b, off, len)
      if (n > 0) decompressedPos += n
      return n
    }
    if (outLo >= outHi) {
      nextFrame(b, off, len)
      if (directN > 0) {
        val n = directN
        directN = 0
        decompressedPos += n
        return n
      }
      if (fallback != null) return read(b, off, len)
      if (finishedAll && outLo >= outHi) return -1
    }
    val take = math.min(len, outHi - outLo)
    System.arraycopy(outBuf, outLo, b, off, take)
    outLo += take
    decompressedPos += take
    take
  }

  override def available(): Int =
    if (fallback != null) fallback.available() else outHi - outLo

  override def close(): Unit = if (!closed) {
    closed = true
    try if (fallback != null) fallback.close() finally {
      ctx.close()
      in.close()
    }
  }
}

/** Member-per-record zstd writer (the write side of `.warc.zst`):
  * each record compresses as ONE complete frame — seekable boundaries
  * for the member index / point lookup, like member-per-record gzip —
  * through ONE reused native [[ZstdCompressCtx]]. An optional
  * dictionary (trained upstream via [[ZstdDict.train]]) is emitted
  * first as the standard skippable frame and applied to every record
  * frame.
  */
final class ZstdMemberWriter(out: OutputStream, level: Int = 3,
    dict: Array[Byte] = null) {
  private val ctx = new ZstdCompressCtx()
  ctx.setLevel(level)
  ctx.setContentSize(true)
  if (dict != null) ctx.loadDict(dict)
  private var wroteDictFrame = false

  /** Write the dictionary skippable frame (raw dictionary content —
    * readers accept raw or compressed; raw keeps the head
    * self-describing). Must be called before the first record when a
    * dictionary is in use.
    */
  def writeDictFrame(): Unit = if (dict != null && !wroteDictFrame) {
    val header = new Array[Byte](8)
    def putLE32(o: Int, v: Int): Unit = {
      header(o) = v.toByte; header(o + 1) = (v >> 8).toByte
      header(o + 2) = (v >> 16).toByte; header(o + 3) = (v >> 24).toByte
    }
    putLE32(0, ZstdWarc.SkippableMin | 0x0D) // 0x184D2A5D, wget's choice
    putLE32(4, dict.length)
    out.write(header)
    out.write(dict)
    wroteDictFrame = true
  }

  /** Compress `bytes` as one frame; returns the frame's compressed
    * length.
    */
  def writeFrame(bytes: Array[Byte], len: Int): Int = {
    writeDictFrame()
    val bound = com.github.luben.zstd.Zstd.compressBound(len.toLong).toInt
    val dst = new Array[Byte](bound)
    val n = ctx.compressByteArray(dst, 0, bound, bytes, 0, len)
    out.write(dst, 0, n)
    n
  }

  def close(): Unit = ctx.close()
}

/** Dictionary training over sample payloads ([[ZstdDictTrainer]],
  * zstd's ZDICT): the writer buffers its first records, trains, then
  * streams — small-record archives compress dramatically better with a
  * shared dictionary (that is the point of the wget convention).
  */
object ZstdDict {
  /** @param dictSize target size; 0 = adaptive (sample mass / 20,
    *        clamped to [4 KiB, 112 KiB] — ZDICT wants samples ~20-100×
    *        the dictionary, and a dictionary bigger than the archive
    *        amortizes never)
    * @return trained dictionary, or None when zstd refuses (too few /
    *         too-uniform samples — legal; write dictionary-less then)
    */
  def train(samples: Seq[Array[Byte]], dictSize: Int = 0): Option[Array[Byte]] = {
    val total = samples.map(_.length.toLong).sum
    val target =
      if (dictSize > 0) dictSize
      else math.max(4 << 10, math.min(112 << 10, (total / 20).toInt))
    if (samples.size < 8 || total < target.toLong * 8) return None
    val trainer = new ZstdDictTrainer(math.min(total, Int.MaxValue / 2).toInt, target)
    samples.foreach(trainer.addSample)
    try Some(trainer.trainSamples())
    catch { case _: com.github.luben.zstd.ZstdException => None }
  }
}
