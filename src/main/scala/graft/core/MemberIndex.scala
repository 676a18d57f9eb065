package graft.core

import java.io.InputStream
import java.util.zip.{DataFormatException, Inflater}

/** Foreign-archive member-index builder: one sequential pass over a
  * gzip or LZ4 WARC finds every compression-member start offset, so the
  * scan's `member_index` option can split archives THIS ENGINE DID NOT
  * WRITE (a stock Common Crawl file) into intra-file parallel
  * partitions. The reference gets dynamic sub-file splitting from Beam
  * restriction trackers (resiliparse-py/resiliparse/beam/warcio.py:
  * 101-109,143); here the index is built once, persisted as the same
  * `.idx` sidecar the WARC sink emits, and every later scan is
  * member-parallel for free.
  *
  * gzip: the container is parsed directly (RFC 1952 header fields) and
  * each member's deflate body is consumed through an `Inflater` with
  * exact byte accounting — member boundaries are PROVEN by the format,
  * never guessed from magic-byte scanning (a `1f 8b` inside compressed
  * data can't fool it). LZ4: the frame format carries explicit block
  * sizes, so the walk is pure offset arithmetic with no decompression.
  *
  * At 100 TB this runs as one task per foreign file (the same cost any
  * first full read pays) and unlocks member-granular splits for every
  * read after; the builder streams — O(64 KiB) memory however large the
  * archive or its members.
  */
object MemberIndex {

  /** `offsets` always carries every member proven up to the first
    * structural problem; `error` is set when the walk ended on damage
    * (truncation, bad header, deflate corruption) rather than clean EOF
    * — the exc_loop doctrine: a corrupt tail costs the tail, not the
    * index.
    */
  final case class Result(codec: String, offsets: Vector[Long], error: Option[String]) {
    def isComplete: Boolean = error.isEmpty
  }

  /** Walk `in` (positioned at byte 0 of the archive) and return member
    * start offsets in compressed-file coordinates. Raw (uncompressed)
    * input reports codec "none" with no offsets — the scan already
    * splits raw files by byte ranges without an index.
    */
  def scan(in: InputStream): Result = {
    val w = new Walker(in)
    val head = w.peek(8)
    WarcCodecs.sniff(head) match {
      case Some(WarcCodecs.Gzip) => gzipMembers(w)
      case Some(WarcCodecs.Lz4)  => lz4Members(w)
      case Some(WarcCodecs.Zstd) => zstdMembers(w)
      case Some(WarcCodecs.Raw)  => Result("none", Vector.empty, None)
      case _ => Result("unknown", Vector.empty,
        Some("unrecognized magic bytes: not a gzip/LZ4/raw WARC"))
    }
  }

  // ---- gzip (RFC 1952) ----------------------------------------------

  private def gzipMembers(w: Walker): Result = {
    val offsets = Vector.newBuilder[Long]
    var n = 0
    val out = new Array[Byte](1 << 16) // inflate sink, contents discarded
    while (true) {
      if (w.atEof) return Result("gzip", offsets.result(), None)
      val memberStart = w.pos
      // fixed header: ID1 ID2 CM FLG MTIME(4) XFL OS
      val id1 = w.read(); val id2 = w.read()
      if (id1 != 0x1f || id2 != 0x8b)
        return Result("gzip", offsets.result(),
          Some(f"bad gzip magic at offset $memberStart (member $n)"))
      val cm = w.read()
      if (cm != 8)
        return Result("gzip", offsets.result(),
          Some(s"unsupported gzip compression method $cm at offset $memberStart"))
      val flg = w.read()
      if (flg < 0 || !w.skip(6))
        return Result("gzip", offsets.result(),
          Some(s"truncated gzip header at offset $memberStart"))
      var ok = true
      if ((flg & 0x04) != 0) { // FEXTRA
        val xlen = w.readLE16()
        ok = xlen >= 0 && w.skip(xlen)
      }
      if (ok && (flg & 0x08) != 0) ok = w.skipZeroTerminated() // FNAME
      if (ok && (flg & 0x10) != 0) ok = w.skipZeroTerminated() // FCOMMENT
      if (ok && (flg & 0x02) != 0) ok = w.skip(2)              // FHCRC
      if (!ok)
        return Result("gzip", offsets.result(),
          Some(s"truncated gzip header fields at offset $memberStart"))
      // deflate body: exact consumption accounting through the Inflater
      val inf = new Inflater(true)
      try {
        var done = false
        while (!done) {
          if (inf.needsInput) {
            val len = w.fillWindow()
            if (len <= 0)
              return Result("gzip", offsets.result(),
                Some(s"truncated deflate stream in member at offset $memberStart"))
            inf.setInput(w.buf, w.lo, len)
          }
          try inf.inflate(out)
          catch { case e: DataFormatException =>
            return Result("gzip", offsets.result(),
              Some(s"deflate corruption in member at offset $memberStart: ${e.getMessage}"))
          }
          if (inf.finished()) {
            // getRemaining = fed bytes the deflate stream did NOT consume
            // — they belong to the trailer / next member
            w.consume((w.hi - w.lo) - inf.getRemaining)
            done = true
          } else if (inf.needsInput) {
            w.consume(w.hi - w.lo) // whole window consumed
          } else if (inf.needsDictionary()) {
            return Result("gzip", offsets.result(),
              Some(s"deflate stream at offset $memberStart needs a preset dictionary"))
          }
        }
      } finally inf.end()
      if (!w.skip(8)) // CRC32 + ISIZE
        return Result("gzip", offsets.result(),
          Some(s"truncated gzip trailer in member at offset $memberStart"))
      offsets += memberStart
      n += 1
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- LZ4 frame (v1.6.1 spec) --------------------------------------

  private val Lz4Magic = 0x184d2204
  private val SkippableMagicBase = 0x184d2a50 // low nibble is free

  private def lz4Members(w: Walker): Result = {
    val offsets = Vector.newBuilder[Long]
    while (true) {
      if (w.atEof) return Result("lz4", offsets.result(), None)
      val frameStart = w.pos
      val magic = w.readLE32()
      if (magic == Lz4Magic) {
        val flg = w.read(); val bd = w.read()
        if (flg < 0 || bd < 0)
          return Result("lz4", offsets.result(),
            Some(s"truncated LZ4 frame descriptor at offset $frameStart"))
        val blockChecksum = (flg & 0x10) != 0
        val contentSize = (flg & 0x08) != 0
        val contentChecksum = (flg & 0x04) != 0
        val dictId = (flg & 0x01) != 0
        var ok = w.skip((if (contentSize) 8 else 0) + (if (dictId) 4 else 0) + 1) // + HC
        while (ok) {
          val bsize = w.readLE32()
          if (bsize == -1)
            return Result("lz4", offsets.result(),
              Some(s"truncated LZ4 block header in frame at offset $frameStart"))
          if (bsize == 0) { // EndMark
            if (contentChecksum) ok = w.skip(4)
            if (!ok)
              return Result("lz4", offsets.result(),
                Some(s"truncated LZ4 content checksum in frame at offset $frameStart"))
            offsets += frameStart
            ok = false // frame complete
          } else {
            val dataLen = (bsize.toLong & 0x7fffffffL) + (if (blockChecksum) 4 else 0)
            if (!w.skip(dataLen))
              return Result("lz4", offsets.result(),
                Some(s"truncated LZ4 block in frame at offset $frameStart"))
          }
        }
      } else if (magic != -1 && (magic & 0xfffffff0) == SkippableMagicBase) {
        // skippable frame: 4-byte size then payload; no member offset —
        // the preceding/following data frame is the seek target
        val size = w.readLE32()
        if (size == -1 || !w.skip(size.toLong & 0xffffffffL))
          return Result("lz4", offsets.result(),
            Some(s"truncated LZ4 skippable frame at offset $frameStart"))
      } else {
        return Result("lz4", offsets.result(),
          Some(f"bad LZ4 frame magic 0x$magic%08x at offset $frameStart"))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- zstd frame (RFC 8878) ----------------------------------------
  // Like LZ4, the zstd container carries explicit block sizes, so the
  // walk is pure offset arithmetic with ZERO decompression — indexing a
  // `.warc.zst` archive costs one sequential read of its compressed
  // bytes. Skippable frames (the wget dictionary convention shares the
  // LZ4 skippable magic) are not members: a seek target must be a data
  // frame. NOT a reference capability (fastwarc has no zstd).

  private val ZstdMagic = 0xFD2FB528

  private def zstdMembers(w: Walker): Result = {
    val offsets = Vector.newBuilder[Long]
    while (true) {
      if (w.atEof) return Result("zstd", offsets.result(), None)
      val frameStart = w.pos
      val magic = w.readLE32()
      if (magic == ZstdMagic) {
        val desc = w.read()
        if (desc < 0)
          return Result("zstd", offsets.result(),
            Some(s"truncated zstd frame descriptor at offset $frameStart"))
        if ((desc & 0x08) != 0)
          return Result("zstd", offsets.result(),
            Some(s"reserved zstd frame-descriptor bit at offset $frameStart"))
        val single = (desc & 0x20) != 0
        val didLen = Array(0, 1, 2, 4)(desc & 3)
        val fcsLen = ((desc >> 6) & 3) match {
          case 0 => if (single) 1 else 0
          case 1 => 2
          case 2 => 4
          case _ => 8
        }
        if (!w.skip((if (single) 0 else 1) + didLen + fcsLen))
          return Result("zstd", offsets.result(),
            Some(s"truncated zstd frame header at offset $frameStart"))
        var last = false
        while (!last) {
          val b0 = w.read(); val b1 = w.read(); val b2 = w.read()
          if (b2 < 0)
            return Result("zstd", offsets.result(),
              Some(s"truncated zstd block header in frame at offset $frameStart"))
          val bh = b0 | (b1 << 8) | (b2 << 16)
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 3
          if (btype == 3)
            return Result("zstd", offsets.result(),
              Some(s"reserved zstd block type in frame at offset $frameStart"))
          val payload = if (btype == 1) 1L else (bh >>> 3).toLong
          if (!w.skip(payload))
            return Result("zstd", offsets.result(),
              Some(s"truncated zstd block in frame at offset $frameStart"))
        }
        if ((desc & 0x04) != 0 && !w.skip(4))
          return Result("zstd", offsets.result(),
            Some(s"truncated zstd content checksum at offset $frameStart"))
        offsets += frameStart
      } else if (magic != -1 && (magic & 0xfffffff0) == SkippableMagicBase) {
        val size = w.readLE32()
        if (size == -1 || !w.skip(size.toLong & 0xffffffffL))
          return Result("zstd", offsets.result(),
            Some(s"truncated zstd skippable frame at offset $frameStart"))
      } else {
        return Result("zstd", offsets.result(),
          Some(f"bad zstd frame magic 0x$magic%08x at offset $frameStart"))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- buffered walker ----------------------------------------------

  /** Sequential buffered reader exposing its window to the Inflater
    * (zero-copy feed) with explicit consumption accounting, so deflate
    * over-read never loses the bytes that belong to the next member.
    */
  private final class Walker(in: InputStream) {
    val buf = new Array[Byte](1 << 16)
    var lo = 0
    var hi = 0
    var pos = 0L
    private var eof = false

    private def fill(): Boolean = {
      if (lo < hi) return true
      if (eof) return false
      lo = 0; hi = 0
      var n = 0
      while (n == 0) { n = in.read(buf); if (n == 0) () }
      if (n < 0) { eof = true; false } else { hi = n; true }
    }

    def atEof: Boolean = !fill()

    /** Up to 8 lookahead bytes without consuming (only valid at a fresh
      * walker — used for codec sniffing at offset 0).
      */
    def peek(n: Int): Array[Byte] = {
      if (!fill()) return Array.emptyByteArray
      // the first fill of a 64 KiB buffer virtually always holds >=8
      // bytes; a pathological short first read just yields fewer
      java.util.Arrays.copyOfRange(buf, lo, math.min(hi, lo + n))
    }

    /** Ensure the window is non-empty and return its length (<=0 at
      * EOF); the window is [buf(lo), buf(hi)).
      */
    def fillWindow(): Int = if (fill()) hi - lo else -1

    /** Advance past `n` bytes of the current window (the Inflater
      * consumed them).
      */
    def consume(n: Int): Unit = { lo += n; pos += n }

    def read(): Int =
      if (!fill()) -1 else { val b = buf(lo) & 0xff; lo += 1; pos += 1; b }

    def readLE16(): Int = {
      val a = read(); val b = read()
      if (b < 0) -1 else a | (b << 8)
    }

    /** -1 on EOF mid-field (indistinguishable from 0xffffffff by value,
      * so callers treat -1 as truncation — no real field here is
      * 0xffffffff: block sizes cap at 2^31 and magics are fixed).
      */
    def readLE32(): Int = {
      val a = read(); val b = read(); val c = read(); val d = read()
      if (d < 0) -1 else a | (b << 8) | (c << 16) | (d << 24)
    }

    def skip(n: Long): Boolean = {
      var left = n
      while (left > 0) {
        if (!fill()) return false
        val take = math.min((hi - lo).toLong, left).toInt
        lo += take; pos += take; left -= take
      }
      true
    }

    def skipZeroTerminated(): Boolean = {
      var b = 0
      while ({ b = read(); b > 0 }) ()
      b == 0
    }
  }
}
