package graft.core

import java.io.{IOException, InputStream}
import java.util.zip.{CRC32, DataFormatException, Inflater}

/** From-scratch multi-member gzip decoder (RFC 1952) with exact
  * compressed-byte accounting, so every member's start offset in
  * COMPRESSED file coordinates is known as a side effect of the decode
  * — the one-pass analog of [[MemberIndex.scan]]: a first full read of
  * a foreign archive (a stock Common Crawl `.warc.gz` the engine did
  * not write) can emit the same `.idx` sidecar the WARC sink produces,
  * and every scan after is member-parallel without a dedicated index
  * pass. The reference gets the equivalent random-addressability from
  * Beam restriction trackers splitting record-at-a-time
  * (resiliparse-py/resiliparse/beam/warcio.py:101-109) and fastwarc's
  * record-addressable GZipStream (fastwarc/stream_io.pyx:561-591).
  *
  * Semantics match commons-compress `GzipCompressorInputStream` with
  * `decompressConcatenated=true`: members decode back to back, each
  * member's CRC32 and ISIZE trailer is verified, truncation and
  * non-gzip bytes between members surface as IOException (the scan
  * layer's error-row contract keys on it). FHCRC/FEXTRA/FNAME/FCOMMENT
  * header fields are parsed and skipped.
  *
  * One `Inflater` is reused across members (reset, not reallocated);
  * inflate writes straight into the caller's buffer — no intermediate
  * copy. Memory is O(64 KiB) however large the archive or its members.
  *
  * @param memberListener invoked once per member, after its header
  *        parses, with (compressed start offset, cumulative decompressed
  *        bytes delivered before this member); null = no tracking.
  *        Offsets arrive in file order. The decompressed coordinate is
  *        exact: a member's header parses only after every byte of the
  *        previous member has been delivered to the caller, so the pair
  *        maps decompressed record positions back to compressed member
  *        addresses (the member-indexed scan's offset rebase).
  */
final class GzipMemberInputStream(in: InputStream,
    memberListener: (Long, Long) => Unit = null) extends InputStream {

  private val buf = new Array[Byte](1 << 16)
  private var lo = 0
  private var hi = 0
  private var cpos = 0L // compressed bytes consumed (file offset of buf(lo))
  private var srcEof = false

  private val inf = new Inflater(true)
  private val crc = new CRC32()
  private var inMember = false
  private var memberStart = 0L
  private var outBytes = 0L // decompressed bytes this member (ISIZE check)
  private var totalOut = 0L // decompressed bytes delivered, all members
  private var fed = 0       // bytes handed to the Inflater from the window
  private var done = false

  private val one = new Array[Byte](1)

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (true) {
      if (done) return -1
      if (!inMember && !startMember()) { done = true; return -1 }
      if (inf.needsInput) {
        // needsInput ⇒ every previously fed byte is consumed; settle the
        // window FIRST (a read() can return mid-member with the fed
        // window exhausted — re-feeding [lo, hi) unconsumed would decode
        // the same bytes twice)
        if (fed > 0) { consume(fed); fed = 0 }
        if (!fill())
          throw new IOException(
            s"gzip: truncated deflate stream in member at offset $memberStart")
        inf.setInput(buf, lo, hi - lo)
        fed = hi - lo
      }
      val n =
        try inf.inflate(b, off, len)
        catch {
          case e: DataFormatException => throw new IOException(
            s"gzip: corrupt deflate data in member at offset $memberStart: ${e.getMessage}", e)
        }
      if (n > 0) { crc.update(b, off, n); outBytes += n; totalOut += n }
      if (inf.finished()) {
        // getRemaining = fed bytes deflate did NOT consume — they are
        // the trailer / the next member's header
        consume(fed - inf.getRemaining)
        fed = 0
        finishMember()
        if (n > 0) return n
      } else if (n > 0) {
        return n
      } else if (inf.needsInput) {
        consume(fed) // whole window consumed
        fed = 0
      } else if (inf.needsDictionary()) {
        throw new IOException(
          s"gzip: deflate stream at offset $memberStart needs a preset dictionary")
      }
    }
    -1 // unreachable
  }

  override def close(): Unit = {
    inf.end()
    in.close()
  }

  /** Parse the next member header; false on clean EOF at a member
    * boundary. Non-gzip bytes where a header must be are corruption.
    */
  private def startMember(): Boolean = {
    if (!fill()) return false
    memberStart = cpos
    val id1 = readU8(); val id2 = readU8()
    if (id1 != 0x1f || id2 != 0x8b)
      throw new IOException(
        f"gzip: garbage after member (bad magic 0x$id1%02x 0x$id2%02x at offset $memberStart)")
    val cm = readU8()
    if (cm != 8)
      throw new IOException(
        s"gzip: unsupported compression method $cm at offset $memberStart")
    val flg = readU8()
    if (flg < 0 || !skipN(6)) // MTIME(4) XFL OS
      throw new IOException(s"gzip: truncated header at offset $memberStart")
    var ok = true
    if ((flg & 0x04) != 0) { // FEXTRA
      val a = readU8(); val b = readU8()
      val xlen = if (b < 0) -1 else a | (b << 8)
      ok = xlen >= 0 && skipN(xlen)
    }
    if (ok && (flg & 0x08) != 0) ok = skipZeroTerminated() // FNAME
    if (ok && (flg & 0x10) != 0) ok = skipZeroTerminated() // FCOMMENT
    if (ok && (flg & 0x02) != 0) ok = skipN(2)             // FHCRC
    if (!ok)
      throw new IOException(s"gzip: truncated header fields at offset $memberStart")
    inMember = true
    if (memberListener != null) memberListener(memberStart, totalOut)
    true
  }

  /** Verify the 8-byte trailer (CRC32 + ISIZE, both LE) and reset for
    * the next member.
    */
  private def finishMember(): Unit = {
    val tcrc = readLE32()
    val tisize = readLE32()
    if (tcrc < 0 || tisize < 0)
      throw new IOException(s"gzip: truncated trailer in member at offset $memberStart")
    if (crc.getValue != tcrc)
      throw new IOException(
        f"gzip: CRC32 mismatch in member at offset $memberStart (0x${crc.getValue}%08x != 0x$tcrc%08x)")
    if ((outBytes & 0xffffffffL) != tisize)
      throw new IOException(
        s"gzip: ISIZE mismatch in member at offset $memberStart " +
        s"(${outBytes & 0xffffffffL} != $tisize)")
    inMember = false
    inf.reset()
    crc.reset()
    outBytes = 0
  }

  // ---- buffered window ------------------------------------------------

  private def fill(): Boolean = {
    if (lo < hi) return true
    if (srcEof) return false
    lo = 0; hi = 0
    var n = 0
    while (n == 0) n = in.read(buf)
    if (n < 0) { srcEof = true; false } else { hi = n; true }
  }

  private def consume(n: Int): Unit = { lo += n; cpos += n }

  private def readU8(): Int =
    if (!fill()) -1 else { val b = buf(lo) & 0xff; lo += 1; cpos += 1; b }

  /** -1 on EOF mid-field; values are in [0, 2^32) so a Long carries
    * them exactly.
    */
  private def readLE32(): Long = {
    val a = readU8(); val b = readU8(); val c = readU8(); val d = readU8()
    if (d < 0) -1L
    else (a.toLong) | (b.toLong << 8) | (c.toLong << 16) | (d.toLong << 24)
  }

  private def skipN(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      if (!fill()) return false
      val take = math.min((hi - lo).toLong, left).toInt
      consume(take)
      left -= take
    }
    true
  }

  private def skipZeroTerminated(): Boolean = {
    var b = 0
    while ({ b = readU8(); b > 0 }) ()
    b == 0
  }
}
