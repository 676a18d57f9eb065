package graft.core

import java.io.{EOFException, IOException, InputStream}

/** From-scratch LZ4 Frame decoder (the lz4 Frame_format.md spec),
  * including DEPENDENT blocks — the mode real WARC-LZ4 corpora use
  * (fastwarc's stream_io.pyx LZ4Stream writes linked blocks) and the
  * reason neither stock JVM reader fits: lz4-java's frame reader
  * rejects linked blocks outright, and commons-compress supports them
  * but decodes ~7 MB/s (byte-at-a-time back-reference copies), 40x off
  * the ~300 MB/s a WARC scan needs to stay decompression-bound like
  * the reference (fastwarc.rst LZ4 row: 49.8k records/s).
  *
  * Design: all decompressed output lands in one linear window buffer
  * whose tail always holds the last 64 KiB of history, so a match
  * offset reaching into the previous block is an ordinary in-buffer
  * copy — no external-dictionary API needed. Before each block the
  * window slides (memmove of at most 64 KiB) when insufficient
  * headroom remains.
  *
  * Supported: v01 frames, dependent + independent blocks, skippable
  * frames, concatenated frames, content size field, block + content
  * xxHash32 checksums (verified). Not supported: external dictionaries
  * (DictID flag) — [[WarcCodecs.open]] falls back to commons-compress
  * for those, and for the legacy frame magic.
  */
object Lz4FrameInputStream {
  /** Distinguishable failure for frames declaring an external dictionary
    * (FLG DictID bit): decoding one without the out-of-band dictionary is
    * impossible for ANY reader, so the scan layer surfaces this as an
    * error row whose message names the cause — operators holding the
    * dictionary can route such archives to a dictionary-aware rescan.
    * [[WarcCodecs.open]] detects the flag on the FIRST frame and falls
    * back to commons-compress; a dict frame appearing LATER in a
    * concatenated stream reaches this decoder mid-scan and lands here.
    */
  final class DictFrameException(msg: String) extends IOException(msg)
}

final class Lz4FrameInputStream(in: InputStream,
    memberListener: (Long, Long) => Unit = null) extends InputStream {

  private val xx = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()

  // compressed bytes consumed — with `memberListener` set, each data
  // frame's start offset in compressed-file coordinates is reported as
  // its header parses, paired with the cumulative decompressed bytes
  // delivered before the frame (exact: a header only parses once the
  // window is drained). Skippable frames are not members — the scan's
  // member_index seeks data frames. This gives the one-pass index and
  // offset-rebase mapping the gzip side gets from
  // [[GzipMemberInputStream]].
  private var cpos = 0L
  private var totalOut = 0L

  private final val Magic = 0x184d2204
  private final val SkippableMin = 0x184d2a50
  private final val SkippableMax = 0x184d2a5f
  private final val HistorySize = 64 * 1024

  // frame state
  private var inFrame = false
  private var blockIndependence = false
  private var blockChecksum = false
  private var contentChecksum = false
  private var declaredContentSize = false
  private var maxBlockSize = 4 * 1024 * 1024
  private var contentHasher: net.jpountz.xxhash.StreamingXXHash32 = _

  // window: [0, limit) decoded bytes, [pos, limit) not yet surfaced
  private var window: Array[Byte] = new Array[Byte](HistorySize + (64 * 1024))
  private var pos = 0
  private var limit = 0
  private var eof = false

  // compressed-block scratch
  private var cbuf: Array[Byte] = new Array[Byte](64 * 1024)

  override def read(): Int = {
    if (!ensure()) -1
    else { val b = window(pos) & 0xff; pos += 1; totalOut += 1; b }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (!ensure()) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(window, pos, b, off, n)
    pos += n
    totalOut += n
    n
  }

  override def available(): Int = limit - pos

  override def close(): Unit = in.close()

  /** Make at least one unread byte available; false at stream end. */
  private def ensure(): Boolean = {
    try {
      while (pos >= limit && !eof) advance()
    } catch {
      // corrupt blocks must surface as IOException (the scan layer's
      // error-row contract keys on it), never as a raw index error
      case e: IndexOutOfBoundsException =>
        throw new IOException(s"lz4: corrupt block (${e.getMessage})", e)
    }
    pos < limit
  }

  private def advance(): Unit = {
    if (!inFrame) {
      if (!readFrameHeader()) { eof = true; return }
    }
    val b0 = in.read()
    if (b0 >= 0) cpos += 1
    if (b0 < 0) {
      // EOF exactly at a block boundary with no EndMark. When the frame
      // DECLARED an integrity surface (content checksum or content
      // size), silence here would let 64 KiB-aligned truncation pass
      // undetected — surface it as IOException (the scan layer's
      // error-row contract keys on it). A frame that declared neither
      // has no way to distinguish this from its legitimate end, so the
      // tolerant-scan behavior (clean end) is kept for those.
      if (contentChecksum || declaredContentSize)
        throw new IOException(
          "lz4: truncated frame (EOF at block boundary, EndMark missing)")
      inFrame = false; eof = true; return
    }
    val blockSizeRaw = b0 | (readByte() << 8) | (readByte() << 16) | (readByte() << 24)
    if (blockSizeRaw == 0) { // EndMark
      if (contentChecksum) {
        val expect = readIntLE()
        if (contentHasher != null && contentHasher.getValue != expect)
          throw new IOException("lz4: content checksum mismatch")
      }
      inFrame = false
      contentHasher = null
      return
    }
    val uncompressed = (blockSizeRaw & 0x80000000) != 0
    val csize = blockSizeRaw & 0x7fffffff
    if (csize > maxBlockSize)
      throw new IOException(s"lz4: block size $csize exceeds frame max $maxBlockSize")
    if (cbuf.length < csize) cbuf = new Array[Byte](csize)
    readFully(cbuf, csize)
    if (blockChecksum) {
      val expect = readIntLE()
      if (xx.hash32().hash(cbuf, 0, csize, 0) != expect)
        throw new IOException("lz4: block checksum mismatch")
    }
    slideWindow()
    val produced =
      if (uncompressed) {
        System.arraycopy(cbuf, 0, window, limit, csize)
        csize
      } else decodeBlock(cbuf, csize, window, limit)
    if (contentHasher != null) contentHasher.update(window, limit, produced)
    limit += produced
  }

  /** Keep the last 64 KiB of decoded history plus maxBlockSize headroom.
    * Independent-block frames reset history at every block boundary, so
    * nothing needs preserving there.
    */
  private def slideWindow(): Unit = {
    val needed = maxBlockSize
    if (window.length - limit >= needed) return
    if (blockIndependence) { pos = 0; limit = 0 }
    else {
      val keep = math.min(limit, HistorySize)
      // pos == limit here (advance only runs when drained)
      System.arraycopy(window, limit - keep, window, 0, keep)
      pos = keep
      limit = keep
    }
    if (window.length < limit + needed)
      window = java.util.Arrays.copyOf(window, limit + needed)
  }

  /** Raw LZ4 block decode into dest at destOff; returns bytes written.
    * Matches may reference up to 64 KiB before destOff (linked blocks).
    */
  private def decodeBlock(src: Array[Byte], srcLen: Int,
      dest: Array[Byte], destOff: Int): Int = {
    var s = 0
    var d = destOff
    val dend = dest.length
    while (s < srcLen) {
      val token = src(s) & 0xff
      s += 1
      // literals
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 0xff
        while (b == 0xff) {
          if (s >= srcLen) throw new IOException("lz4: truncated literal length")
          b = src(s) & 0xff; s += 1; litLen += b
        }
      }
      if (s + litLen > srcLen || d + litLen > dend)
        throw new IOException("lz4: literal overrun")
      System.arraycopy(src, s, dest, d, litLen)
      s += litLen
      d += litLen
      if (s >= srcLen) return d - destOff // last sequence has no match
      // match
      if (s + 2 > srcLen) throw new IOException("lz4: truncated match offset")
      val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
      s += 2
      if (offset == 0) throw new IOException("lz4: zero match offset")
      var mLen = (token & 0xf) + 4
      if ((token & 0xf) == 15) {
        var b = 0xff
        while (b == 0xff) {
          if (s >= srcLen) throw new IOException("lz4: truncated match length")
          b = src(s) & 0xff; s += 1; mLen += b
        }
      }
      var m = d - offset
      if (m < 0) throw new IOException("lz4: match offset before window start")
      if (d + mLen > dend) throw new IOException("lz4: match overrun")
      if (offset >= mLen) { // non-overlapping: bulk copy
        System.arraycopy(dest, m, dest, d, mLen)
        d += mLen
      } else {
        // overlapping run: the window [m, d) is a self-replicating
        // pattern of period `offset` — copy it with doubling arraycopy
        // (offset-1 RLE fills in log(mLen) copies, not mLen byte writes)
        var remaining = mLen
        while (remaining > 0) {
          val n = math.min(d - m, remaining)
          System.arraycopy(dest, m, dest, d, n)
          d += n
          remaining -= n
        }
      }
    }
    d - destOff
  }

  /** Parse the next frame header (skipping skippable frames); false on
    * clean EOF.
    */
  private def readFrameHeader(): Boolean = {
    while (true) {
      val frameStart = cpos
      val b0 = in.read()
      if (b0 < 0) return false
      cpos += 1
      val magic = b0 | (readByte() << 8) | (readByte() << 16) | (readByte() << 24)
      if (magic >= SkippableMin && magic <= SkippableMax) {
        var skip = readIntLE().toLong & 0xffffffffL
        while (skip > 0) {
          val n = in.skip(skip)
          if (n <= 0) {
            if (in.read() < 0) throw new EOFException("lz4: truncated skippable frame")
            cpos += 1
            skip -= 1
          } else { cpos += n; skip -= n }
        }
      } else if (magic == Magic) {
        // collect the descriptor bytes (FLG..content size) so the HC
        // header checksum — xxh32(descriptor, 0) >> 8, low byte — can be
        // verified: a corrupted FLG/BD silently flips integrity flags /
        // window sizing otherwise, and the check is one hash of <= 14
        // bytes
        val desc = new Array[Byte](14)
        var descLen = 0
        def descByte(): Int = {
          val b = readByte(); desc(descLen) = b.toByte; descLen += 1; b
        }
        val flg = descByte()
        if ((flg >>> 6) != 1) throw new IOException(s"lz4: unsupported frame version ${flg >>> 6}")
        blockIndependence = (flg & 0x20) != 0
        blockChecksum = (flg & 0x10) != 0
        val hasContentSize = (flg & 0x08) != 0
        declaredContentSize = hasContentSize
        contentChecksum = (flg & 0x04) != 0
        if ((flg & 0x01) != 0)
          throw new Lz4FrameInputStream.DictFrameException(
            "lz4: frame declares an external dictionary (DictID) — " +
            "undecodable without the out-of-band dictionary; rescan with " +
            "a dictionary-aware codec")
        val bd = descByte()
        maxBlockSize = ((bd >>> 4) & 0x7) match {
          case 4 => 64 * 1024
          case 5 => 256 * 1024
          case 6 => 1024 * 1024
          case 7 => 4 * 1024 * 1024
          case x => throw new IOException(s"lz4: invalid block max size code $x")
        }
        if (hasContentSize) { var i = 0; while (i < 8) { descByte(); i += 1 } }
        val hc = readByte()
        val expectHc = (xx.hash32().hash(desc, 0, descLen, 0) >>> 8) & 0xff
        if (hc != expectHc)
          throw new IOException(
            f"lz4: frame header checksum mismatch (0x$hc%02x != 0x$expectHc%02x)")
        contentHasher = if (contentChecksum) xx.newStreamingHash32(0) else null
        inFrame = true
        if (memberListener != null) memberListener(frameStart, totalOut)
        // fresh frame: history never crosses frame boundaries
        pos = 0; limit = 0
        return true
      } else throw new IOException(f"lz4: bad frame magic 0x$magic%08x")
    }
    false // unreachable
  }

  private def readByte(): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("lz4: truncated frame header")
    cpos += 1
    b
  }

  private def readIntLE(): Int =
    readByte() | (readByte() << 8) | (readByte() << 16) | (readByte() << 24)

  private def readFully(buf: Array[Byte], len: Int): Unit = {
    var n = 0
    while (n < len) {
      val r = in.read(buf, n, len - n)
      if (r < 0) throw new EOFException("lz4: truncated block")
      n += r
    }
    cpos += len
  }
}
