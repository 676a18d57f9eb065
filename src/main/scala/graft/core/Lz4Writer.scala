package graft.core

import java.io.OutputStream

/** From-scratch LZ4 Frame writer (the lz4 Frame_format.md / Block_format
  * companion to [[Lz4FrameInputStream]]): greedy hash-table block
  * compressor plus the v01 frame container, supporting both independent
  * and LINKED blocks — linked is what the reference's LZ4Stream writes
  * (fastwarc stream_io.pyx), carrying the last 64 KiB of input history
  * across block boundaries so cross-block matches compress boilerplate
  * runs the independent mode cannot.
  *
  * The commons-compress frame writer this replaces buffers through its
  * own LZ77 engine at a fraction of this speed and cannot be asked for
  * the same frame layout the reference emits.
  *
  * Encoder validity rules honored (Block_format.md): the last sequence
  * is literals-only, a match never starts within the final 12 bytes,
  * offsets never exceed 65535 or reach before the window start.
  */
final class Lz4FrameOutputStream(
    out: OutputStream,
    blockSize: Int = 64 * 1024,
    linked: Boolean = true,
    contentChecksum: Boolean = true) extends OutputStream {

  // 4 MiB is the largest declarable Block_Maximum_Size (BD code 7): a
  // bigger blockSize would emit blocks the frame header disclaims and
  // every conforming reader (ours included) rejects
  require(blockSize >= 1 && blockSize <= 4 * 1024 * 1024,
    s"blockSize must be in [1, 4 MiB], got $blockSize")

  private val xx = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()
  private val contentHasher =
    if (contentChecksum) xx.newStreamingHash32(0) else null

  private final val History = 64 * 1024
  // input accumulator: [0, fill) holds history tail + the pending block
  private val inBuf = new Array[Byte](History + blockSize)
  private var fill = 0
  private var blockStart = 0 // pending block begins here; history before it
  private val dstBuf = new Array[Byte](blockSize + (blockSize >> 8) + 64)
  private val hashTable = new Array[Int](1 << 13) // 4-byte-sequence -> pos + 1
  private var headerWritten = false
  private var closed = false

  override def write(b: Int): Unit = {
    val one = Array(b.toByte)
    write(one, 0, 1)
  }

  override def write(b: Array[Byte], off0: Int, len0: Int): Unit = {
    var off = off0
    var len = len0
    while (len > 0) {
      val room = inBuf.length - fill
      val n = math.min(room, len)
      System.arraycopy(b, off, inBuf, fill, n)
      fill += n
      off += n
      len -= n
      while (fill - blockStart >= blockSize) flushBlock()
    }
  }

  override def flush(): Unit = out.flush()

  /** Complete the frame (EndMark + content checksum) WITHOUT closing the
    * underlying stream — the member-per-record WARC writer finishes one
    * frame per record on a shared output.
    */
  def finish(): Unit = {
    if (closed) return
    closed = true
    if (!headerWritten) writeFrameHeader()
    if (fill > blockStart) flushBlock()
    writeIntLE(0) // EndMark
    if (contentHasher != null) writeIntLE(contentHasher.getValue)
    out.flush()
  }

  override def close(): Unit = {
    val wasClosed = closed
    finish()
    if (!wasClosed) out.close()
  }

  /** Re-arm after [[finish]] to write another frame to the same output —
    * the member-per-record WARC sink writes tens of thousands of frames
    * per file, and constructing a fresh writer per record would churn
    * ~230 KB of buffers each time.
    */
  def reset(): Unit = {
    fill = 0
    blockStart = 0
    headerWritten = false
    closed = false
    if (contentHasher != null) contentHasher.reset()
    java.util.Arrays.fill(hashTable, 0)
  }

  private def writeFrameHeader(): Unit = {
    headerWritten = true
    out.write(0x04); out.write(0x22); out.write(0x4d); out.write(0x18)
    var flg = 0x40 // version 01
    if (!linked) flg |= 0x20
    if (contentChecksum) flg |= 0x04
    val bd = bdByte
    val hdr = Array(flg.toByte, bd.toByte)
    val hc = (xx.hash32().hash(hdr, 0, 2, 0) >> 8) & 0xff
    out.write(flg); out.write(bd); out.write(hc)
  }

  private def bdByte: Int = {
    // smallest standard size >= blockSize
    val code =
      if (blockSize <= 64 * 1024) 4
      else if (blockSize <= 256 * 1024) 5
      else if (blockSize <= 1024 * 1024) 6
      else 7
    code << 4
  }

  private def flushBlock(): Unit = {
    if (!headerWritten) writeFrameHeader()
    val start = blockStart
    val end = math.min(fill, start + blockSize)
    val len = end - start
    if (len == 0) return
    if (contentHasher != null) contentHasher.update(inBuf, start, len)
    val windowStart = if (linked) math.max(0, start - History) else start
    val csize = compressBlock(inBuf, windowStart, start, end, dstBuf)
    if (csize > 0 && csize < len) {
      writeIntLE(csize)
      out.write(dstBuf, 0, csize)
    } else {
      writeIntLE(len | 0x80000000) // stored block
      out.write(inBuf, start, len)
    }
    // slide: keep the last History bytes (which include this block) as
    // the next block's match window; drop everything older
    val remain = fill - end
    if (linked) {
      val keepFrom = math.max(0, end - History)
      val keep = end - keepFrom
      System.arraycopy(inBuf, keepFrom, inBuf, 0, keep + remain)
      blockStart = keep
      fill = keep + remain
      // positions in the hash table refer to the OLD layout — reset.
      // (A delta-rebase would keep cross-block matches cheaper to find;
      // the window bytes are still matchable because compressBlock seeds
      // its table from the window region on each call.)
      java.util.Arrays.fill(hashTable, 0)
    } else {
      System.arraycopy(inBuf, end, inBuf, 0, remain)
      blockStart = 0
      fill = remain
      java.util.Arrays.fill(hashTable, 0)
    }
  }

  private def hash4(src: Array[Byte], i: Int): Int = {
    val v = ((src(i) & 0xff)) | ((src(i + 1) & 0xff) << 8) |
      ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
    (v * -1640531535) >>> 19 // Fibonacci hash to 13 bits
  }

  /** Greedy LZ4 block compression of src[blockStart, blockEnd), with
    * matches allowed back to windowStart (linked-block history). Returns
    * compressed size into dst, or -1 when dst would overflow
    * (incompressible — caller stores the block raw).
    */
  private def compressBlock(src: Array[Byte], windowStart: Int,
      blockStart: Int, blockEnd: Int, dst: Array[Byte]): Int = {
    var d = 0
    var anchor = blockStart
    var i = blockStart
    // matches must not start in the last 12 bytes; last 5 are literals
    val matchLimit = blockEnd - 12
    // seed the table with window positions so first-block-byte matches
    // into the history window are found (linked mode)
    if (windowStart < blockStart) {
      var w = math.max(windowStart, blockStart - History)
      val wEnd = blockStart - 4
      // sparse seeding (every 2nd position): full seeding of 64 KiB
      // costs more than it saves on typical blocks
      while (w < wEnd) { hashTable(hash4(src, w)) = w + 1; w += 2 }
    }
    while (i <= matchLimit) {
      val h = hash4(src, i)
      val cand = hashTable(h) - 1
      hashTable(h) = i + 1
      if (cand >= windowStart && i - cand <= 0xffff &&
          src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
          src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)) {
        // extend
        var m = 4
        val maxM = blockEnd - 5 - i // keep last 5 bytes literal
        while (m < maxM && src(cand + m) == src(i + m)) m += 1
        locally {
          // emit sequence: literals [anchor, i), match (offset, m)
          val litLen = i - anchor
          val needed = d + 1 + (litLen / 255 + 1) + litLen + 2 + (m / 255 + 1)
          if (needed >= dst.length) return -1
          val tokenPos = d
          d += 1
          var ll = litLen
          if (ll >= 15) {
            var rest = ll - 15
            while (rest >= 255) { dst(d) = 0xff.toByte; d += 1; rest -= 255 }
            dst(d) = rest.toByte; d += 1
          }
          System.arraycopy(src, anchor, dst, d, litLen)
          d += litLen
          val offset = i - cand
          dst(d) = (offset & 0xff).toByte
          dst(d + 1) = ((offset >> 8) & 0xff).toByte
          d += 2
          var ml = m - 4
          val token = ((math.min(15, litLen)) << 4) | math.min(15, ml)
          dst(tokenPos) = token.toByte
          if (ml >= 15) {
            var rest = ml - 15
            while (rest >= 255) { dst(d) = 0xff.toByte; d += 1; rest -= 255 }
            dst(d) = rest.toByte; d += 1
          }
          i += m
          anchor = i
        }
      } else i += 1
    }
    // trailing literals
    val litLen = blockEnd - anchor
    val needed = d + 1 + (litLen / 255 + 1) + litLen
    if (needed >= dst.length) return -1
    val tokenPos = d
    d += 1
    var ll = litLen
    dst(tokenPos) = ((math.min(15, ll)) << 4).toByte
    if (ll >= 15) {
      var rest = ll - 15
      while (rest >= 255) { dst(d) = 0xff.toByte; d += 1; rest -= 255 }
      dst(d) = rest.toByte; d += 1
    }
    System.arraycopy(src, anchor, dst, d, litLen)
    d += litLen
    d
  }

  private def writeIntLE(v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
