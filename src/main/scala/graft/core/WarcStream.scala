package graft.core

import java.io.{BufferedInputStream, EOFException, InputStream}
import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream

/** Buffered byte reader over a (possibly decompressed) WARC stream with
  * the primitives the record parser needs: CRLF line reads, bounded fully
  * reads, skip-without-buffering, and a consumed-byte position counter
  * (the reference's BufferedReader, stream_io.pyx:861-1126, re-thought
  * for the JVM; position ≈ stream_pos, warc.pyx:712-719).
  */
final class WarcByteReader(in: InputStream, bufSize: Int = 64 * 1024,
    baseOffset: Long = 0L) {
  private val buf = new Array[Byte](bufSize)
  private var lo = 0
  private var hi = 0
  private var consumed: Long = baseOffset
  private var eof = false

  /** Bytes consumed from the (decompressed) stream so far. */
  def position: Long = consumed

  /** Set when the underlying stream died mid-read (e.g. a truncated gzip
    * member): the reader reports EOF and the parser emits the partial
    * record with an error column — a corrupt archive must not fail the
    * task (exc_loop doctrine, itertools.pyx:37-63).
    */
  private var _streamError: Option[String] = None
  def streamError: Option[String] = _streamError

  private def fill(): Boolean = {
    if (lo < hi) return true
    if (eof) return false
    lo = 0
    hi = 0
    val n =
      try in.read(buf)
      catch { case e: java.io.IOException =>
        _streamError = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        -1
      }
    if (n <= 0) { eof = true; false }
    else { hi = n; true }
  }

  def atEof: Boolean = !fill()

  /** Read one line up to and including '\n'; returns the line WITHOUT the
    * trailing CRLF / LF. None at EOF. Lines longer than maxLen are
    * truncated in the result but fully consumed (malformed-input guard:
    * one pathological record must not OOM the task).
    */
  def readLine(maxLen: Int = 1 << 20): Option[Array[Byte]] = {
    if (!fill()) return None
    // fast path: the whole line sits in the current buffer window (the
    // overwhelmingly common case for ~50-byte header lines against a
    // 64 KiB buffer) — one copyOfRange instead of a BAOS + grow +
    // toByteArray chain per line, the header-scan hot path
    var j = lo
    while (j < hi && buf(j) != '\n') j += 1
    if (j < hi) {
      var end = j
      if (end > lo && buf(end - 1) == '\r') end -= 1
      val take = math.min(end - lo, maxLen)
      val line = java.util.Arrays.copyOfRange(buf, lo, lo + take)
      consumed += j - lo + 1
      lo = j + 1
      return Some(line)
    }
    val out = new java.io.ByteArrayOutputStream(128)
    var done = false
    while (!done) {
      if (!fill()) { done = true } // EOF terminates the line
      else {
        var i = lo
        var nl = -1
        while (i < hi && nl < 0) { if (buf(i) == '\n') nl = i; i += 1 }
        if (nl >= 0) {
          val take = nl - lo
          if (out.size < maxLen) out.write(buf, lo, math.min(take, maxLen - out.size))
          consumed += take + 1
          lo = nl + 1
          done = true
        } else {
          val take = hi - lo
          if (out.size < maxLen) out.write(buf, lo, math.min(take, maxLen - out.size))
          consumed += take
          lo = hi
        }
      }
    }
    val bytes = out.toByteArray
    // strip trailing \r
    if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      Some(java.util.Arrays.copyOf(bytes, bytes.length - 1))
    else Some(bytes)
  }

  /** Read exactly n bytes (throws EOFException if the stream ends early). */
  def readFully(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      if (!fill()) throw new EOFException(s"stream ended after $off of $n content bytes")
      val take = math.min(hi - lo, n - off)
      System.arraycopy(buf, lo, out, off, take)
      lo += take
      off += take
      consumed += take
    }
    out
  }

  /** Skip exactly n bytes without materializing them (the reference's
    * single biggest scan-throughput lever: filtered records are consumed,
    * never buffered — warc.pyx:1246, stream_io.pyx:1096-1118).
    */
  def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      if (!fill()) return false
      val take = math.min((hi - lo).toLong, left).toInt
      lo += take
      left -= take
      consumed += take
    }
    true
  }

  def close(): Unit = in.close()
}

/** Compression negotiation by magic bytes — gzip `1f 8b`, LZ4 frame
  * `04 22 4d 18`, raw `WARC/` — mirroring the reference's stream
  * auto-detection (stream_io.pyx:890-917) with JVM codecs:
  * commons-compress multi-member gzip and lz4-java frame streams, plus
  * the from-scratch [[Brotli]] decoder. Brotli has no magic bytes, so it
  * is selected by file extension (`.br`), matching the reference CLI.
  */
object WarcCodecs {

  sealed trait Codec { def name: String }
  case object Raw extends Codec { val name = "none" }
  case object Gzip extends Codec { val name = "gzip" }
  case object Lz4 extends Codec { val name = "lz4" }
  case object Br extends Codec { val name = "brotli" }
  case object Zstd extends Codec { val name = "zstd" }

  def sniff(head: Array[Byte]): Option[Codec] = {
    if (head.length >= 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b) Some(Gzip)
    else if (head.length >= 4 && (head(0) & 0xff) == 0x04 && (head(1) & 0xff) == 0x22 &&
             (head(2) & 0xff) == 0x4d && (head(3) & 0xff) == 0x18) Some(Lz4)
    // zstd data frame (28 B5 2F FD) or a LEADING skippable frame
    // (5x 2A 4D 18) — a dictionary-led `.warc.zst` starts with one.
    // NB the skippable magic is shared with LZ4; a skippable-LED file
    // routes to zstd (the only convention that actually leads with one
    // — wget dictionaries). A hypothetical skippable-led LZ4 archive
    // would surface a "bad zstd frame magic" error row, not silent loss
    else if (head.length >= 4 && (head(0) & 0xff) == 0x28 && (head(1) & 0xff) == 0xb5 &&
             (head(2) & 0xff) == 0x2f && (head(3) & 0xff) == 0xfd) Some(Zstd)
    else if (head.length >= 4 && ((head(0) & 0xf0) == 0x50) && (head(1) & 0xff) == 0x2a &&
             (head(2) & 0xff) == 0x4d && (head(3) & 0xff) == 0x18) Some(Zstd)
    else if (head.length >= 5 && head.startsWith("WARC/".getBytes)) Some(Raw)
    else None
  }

  /** `open` with extension-based brotli selection: `.br` / `.warc.br`
    * files decode through [[BrotliInputStream]] (no magic to sniff);
    * everything else goes through magic-byte detection.
    */
  def openWithName(raw: InputStream, fileName: String,
      memberListener: Long => Unit = null): (InputStream, Codec) =
    if (fileName != null && fileName.toLowerCase.endsWith(".br"))
      (new BrotliInputStream(new BufferedInputStream(raw, 64 * 1024)), Br)
    else open(raw, memberListener)

  /** [[openTracked]] with only the compressed member-start coordinate —
    * the one-pass member-index side-output (`emit_member_index`).
    */
  def open(raw: InputStream, memberListener: Long => Unit = null): (InputStream, Codec) =
    openTracked(raw,
      if (memberListener == null) null
      else (c: Long, _: Long) => memberListener(c))

  /** Wrap a raw input stream in the detected decompressor. Unknown magic
    * falls back to raw passthrough (tolerant mode — the parser will
    * surface a useful error if it isn't WARC at all).
    *
    * `memberListener` (optional) receives each compression member's
    * (compressed start offset, decompressed bytes delivered before it)
    * as the decode reaches it — the member-index side-output and the
    * member-indexed scan's offset rebase (gzip and the from-scratch LZ4
    * decoder; the commons-compress dict-LZ4 fallback has no byte
    * accounting, so dict frames scan without tracking).
    */
  def openTracked(raw: InputStream,
      memberListener: (Long, Long) => Unit = null): (InputStream, Codec) = {
    val buffered = new BufferedInputStream(raw, 64 * 1024)
    buffered.mark(8)
    val head = new Array[Byte](8)
    var n = 0
    var r = 0
    while (n < 8 && r >= 0) {
      r = buffered.read(head, n, 8 - n)
      if (r > 0) n += r
    }
    buffered.reset()
    sniff(java.util.Arrays.copyOf(head, n)) match {
      // The from-scratch multi-member reader decodes the concatenated
      // chain with exact compressed-byte accounting (per-member CRC32 +
      // ISIZE verified like commons-compress), which is what makes the
      // one-pass member-index side-output possible.
      case Some(Gzip) => (new GzipMemberInputStream(buffered, memberListener), Gzip)
      // The from-scratch frame decoder ([[Lz4FrameInputStream]]) handles
      // the DEPENDENT blocks real WARC-LZ4 corpora use at full speed —
      // lz4-java's frame reader rejects them, and commons-compress
      // decodes them ~40x slower than the scan needs. Frames declaring
      // an external dictionary (FLG bit 0, visible in the sniffed head)
      // are the one feature it refuses; those fall back to
      // commons-compress. Known limitation: only the FIRST frame's FLG
      // is sniffed here — a dict-flagged frame later in a concatenated
      // stream surfaces mid-scan as a terminal error row carrying
      // [[Lz4FrameInputStream.DictFrameException]]'s message (records
      // after it in that file are not parsed). That is deliberate: no
      // reader can decode such a frame without the out-of-band
      // dictionary, so the error row names the cause and an operator
      // holding the dictionary can rescan the flagged file.
      case Some(Lz4) =>
        val dictId = n >= 5 && (head(4) & 0x01) != 0
        if (dictId) (new FramedLZ4CompressorInputStream(buffered, true), Lz4)
        else (new Lz4FrameInputStream(buffered, memberListener), Lz4)
      // `.warc.zst` (wget/IIPC convention; NOT in the reference): frame
      // boundaries reported like gzip members, optional leading
      // dictionary skippable frame handled inside the reader
      case Some(Zstd) => (new ZstdFrameInputStream(buffered, memberListener), Zstd)
      case _          => (buffered, Raw)
    }
  }
}
