package graft.core

import java.nio.charset.StandardCharsets
import java.time.Instant
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Options mirroring the reference `ArchiveIterator` kwargs
  * (fastwarc-py/fastwarc/warc.pyx:1102-1124), i.e. the filters a scan can
  * push down: record-type bitmask, content-length bounds, HTTP parsing
  * toggle, strictness.
  *
  * @param maxContentLength  records above this are skipped entirely unless
  *                          `keepMetaOverMax` (Beam always_keep_meta
  *                          behavior, beam/warcio.py:145-149) keeps the
  *                          envelope with an empty payload.
  */
final case class WarcParseOptions(
    recordTypeMask: Int = RecordType.AnyType,
    minContentLength: Long = -1L,
    maxContentLength: Long = -1L,
    parseHttp: Boolean = true,
    keepMetaOverMax: Boolean = false,
    strict: Boolean = false,
    maxHeaderBytes: Int = 1 << 20,
    /** false = envelope-only scan: payloads are skipped, never buffered —
      * the column-pruning analog of the reference's early-exit header
      * parse (warc.pyx:1216-1230). Set by the Spark scan when no
      * content/http/digest column is required.
      */
    readPayload: Boolean = true)

/** Streaming WARC record parser: the scan inner loop
  * (reference semantics: warc.pyx:1172-1262, record.rs:973-1040).
  *
  * Forward-only, single pass, O(buffer) memory. Filtered records are
  * skipped without materializing their payload. Malformed records
  * surface as records with `error` set rather than exceptions — one
  * pathological document must not kill a 1000-executor job
  * (exc_loop doctrine, resiliparse-py/resiliparse/itertools.pyx:37-63).
  */
final class WarcParser(
    reader: WarcByteReader,
    filename: String,
    opts: WarcParseOptions = WarcParseOptions()) extends Iterator[WarcRecord] {

  private var nextRec: WarcRecord = _
  private var finished = false

  override def hasNext: Boolean = {
    if (nextRec != null) return true
    if (finished) return false
    nextRec = advance()
    if (nextRec == null) { finished = true; false } else true
  }

  override def next(): WarcRecord = {
    if (!hasNext) throw new NoSuchElementException
    val r = nextRec
    nextRec = null
    r
  }

  /** Scan forward to the next version line, parse, filter, emit. */
  private def advance(): WarcRecord = {
    while (true) {
      // 1. find the version line (skipping record separators / garbage —
      //    quirks tolerance for legacy WARC/0.x, warc.pyx:1184-1207)
      var versionLine: Array[Byte] = null
      var offset = 0L
      while (versionLine == null) {
        offset = reader.position
        reader.readLine() match {
          case None => return null
          case Some(line) =>
            if (line.length >= 5 && line.startsWith(WarcParser.Magic) &&
                (!opts.strict || WarcParser.isModernVersion(line)))
              versionLine = line
          // else: garbage / blank between records — keep scanning
        }
      }
      val versionStr = new String(versionLine, StandardCharsets.US_ASCII).trim

      // 2. header block
      val (headers, headersTruncated) = parseHeaderBlock()
      val contentLength = headers.get("Content-Length").flatMap(s => Try(s.trim.toLong).toOption)
      val recType = headers.get("WARC-Type").map(_.trim.toLowerCase).getOrElse("unknown")
      val mask = RecordType.mask(recType)

      // Oversized header blocks surface as an error flag rather than a
      // silently-truncated HeaderMap (indistinguishable from well-formed);
      // every emitted record carries its version line.
      def withTruncFlag(r0: WarcRecord): WarcRecord = {
        val r = r0.copy(version = versionStr)
        if (headersTruncated && r.error.isEmpty)
          r.copy(error = Some("header block truncated: exceeds max_header_bytes"))
        else r
      }

      contentLength match {
        case None =>
          // Missing Content-Length (clueweb-style quirk): emit envelope
          // with error, then resync at the next version line.
          if (RecordType.matches(mask, opts.recordTypeMask)) {
            return withTruncFlag(WarcRecord(filename, offset, reader.position - offset,
              headers.get("WARC-Record-ID"), recType, mask,
              parseDate(headers), -1L, headers, Array.emptyByteArray, None,
              Some("missing Content-Length")))
          }
        case Some(len) =>
          // 3. cheap pushed-down filters, evaluated before touching payload
          val typeOk = RecordType.matches(mask, opts.recordTypeMask)
          val minOk = opts.minContentLength < 0 || len >= opts.minContentLength
          val maxOk = opts.maxContentLength < 0 || len <= opts.maxContentLength
          if (!typeOk || !minOk || (!maxOk && !opts.keepMetaOverMax)) {
            reader.skipFully(len) // skip, never buffer
          } else if (!maxOk) {
            reader.skipFully(len)
            return withTruncFlag(WarcRecord(filename, offset, reader.position - offset,
              headers.get("WARC-Record-ID"), recType, mask,
              parseDate(headers), len, headers, Array.emptyByteArray, None,
              Some("payload dropped: exceeds max_content_length")))
          } else {
            // `length` spans version line through content end; the full
            // on-stream footprint incl. the \r\n\r\n separator is
            // lead(offset) - offset (CDXJ window query).
            return withTruncFlag(readContent(offset, headers, recType, mask, len)
              .copy(length = reader.position - offset))
          }
      }
    }
    null // unreachable
  }

  private def readContent(
      offset: Long, headers: HeaderMap, recType: String,
      mask: Int, len: Long): WarcRecord = {
    if (!opts.readPayload) {
      val complete = reader.skipFully(len)
      return WarcRecord(filename, offset, reader.position - offset,
        headers.get("WARC-Record-ID"), recType, mask, parseDate(headers),
        len, headers, Array.emptyByteArray, None,
        if (complete) None else Some("truncated record: stream ended mid-payload"))
    }
    if (len > Int.MaxValue - 8) {
      reader.skipFully(len)
      return WarcRecord(filename, offset, reader.position - offset,
        headers.get("WARC-Record-ID"), recType, mask, parseDate(headers),
        len, headers, Array.emptyByteArray, None,
        Some(s"record content too large for a single row: $len bytes"))
    }
    val content =
      try reader.readFully(len.toInt)
      catch {
        case e: java.io.EOFException =>
          return WarcRecord(filename, offset, reader.position - offset,
            headers.get("WARC-Record-ID"), recType, mask, parseDate(headers),
            len, headers, Array.emptyByteArray, None,
            Some(s"truncated record: ${e.getMessage}"))
      }
    val http =
      if (opts.parseHttp && WarcParser.isHttpRecord(headers)) HttpParser.parse(content)
      else None
    WarcRecord(filename, offset, 0L, headers.get("WARC-Record-ID"), recType,
      mask, parseDate(headers), len, headers, content, http, None)
  }

  /** `Key: value` lines until the empty line; continuation lines (leading
    * space/tab) folded with a single space (record.rs:546-555); UTF-8.
    * Returns (headers, truncated): lines past maxHeaderBytes are consumed
    * but not kept, and the truncation is reported so the record carries an
    * error flag instead of masquerading as well-formed.
    */
  private def parseHeaderBlock(): (HeaderMap, Boolean) = {
    val entries = new scala.collection.mutable.ArrayBuffer[(String, String)](16)
    var total = 0
    var truncated = false
    var done = false
    // String.trim semantics on bytes: chars <= U+0020. A negative byte is
    // part of a multi-byte UTF-8 char (>= U+0080), never trimmable, and a
    // ':' byte (0x3A) never occurs inside a multi-byte sequence — so the
    // byte-level split/trim is exactly the old decode-then-trim, minus
    // the whole-line String and two substring copies per header line
    // (the envelope-scan profile's top non-IO frames).
    @inline def ws(b: Byte): Boolean = b >= 0 && b <= ' '
    while (!done) {
      reader.readLine() match {
        case None => done = true
        case Some(line) if line.isEmpty => done = true
        case Some(line) =>
          total += line.length
          if (total <= opts.maxHeaderBytes) {
            if ((line(0) == ' ' || line(0) == '\t') && entries.nonEmpty) {
              // folded continuation line (rare) — keep the simple path
              val s = new String(line, StandardCharsets.UTF_8)
              val (k, v) = entries(entries.length - 1)
              entries(entries.length - 1) = k -> (v + " " + s.trim)
            } else {
              var colon = 0
              while (colon < line.length && line(colon) != ':') colon += 1
              if (colon > 0 && colon < line.length) {
                var ks = 0; var ke = colon
                while (ks < ke && ws(line(ks))) ks += 1
                while (ke > ks && ws(line(ke - 1))) ke -= 1
                var vs = colon + 1; var ve = line.length
                while (vs < ve && ws(line(vs))) vs += 1
                while (ve > vs && ws(line(ve - 1))) ve -= 1
                entries += (new String(line, ks, ke - ks, StandardCharsets.UTF_8) ->
                  new String(line, vs, ve - vs, StandardCharsets.UTF_8))
              }
              // lines without ':' outside a continuation are dropped (tolerant)
            }
          } else truncated = true
      }
    }
    (HeaderMap(entries.toVector), truncated)
  }

  private def parseDate(headers: HeaderMap): Option[Instant] =
    headers.get("WARC-Date").flatMap(WarcParser.parseWarcDate)
}

object WarcParser {
  private val Magic: Array[Byte] = "WARC/".getBytes(StandardCharsets.US_ASCII)

  def isVersionLine(line: Array[Byte]): Boolean =
    line.length >= 6 && line.startsWith(Magic)

  def isModernVersion(line: Array[Byte]): Boolean = {
    val s = new String(line, StandardCharsets.US_ASCII)
    s.startsWith("WARC/1.")
  }

  /** A record payload is HTTP iff its Content-Type is application/http
    * (warc.pyx:570-599).
    */
  def isHttpRecord(headers: HeaderMap): Boolean =
    headers.get("Content-Type").exists(_.trim.toLowerCase.startsWith("application/http"))

  /** ISO-8601 with Z or offset; lenient on sub-second precision
    * (warc.pyx:532-543: `Z→+00:00`).
    */
  def parseWarcDate(s: String): Option[Instant] = {
    // fast path: the WARC/1.0 mandated "YYYY-MM-DDThh:mm:ssZ" shape
    // (virtually every record) parsed by direct digit extraction — the
    // DateTimeFormatter machinery showed on the envelope-scan profile
    val t = s.trim
    if (t.length == 20 && t.charAt(4) == '-' && t.charAt(7) == '-' &&
        t.charAt(10) == 'T' && t.charAt(13) == ':' && t.charAt(16) == ':' &&
        t.charAt(19) == 'Z') {
      var ok = true
      @inline def d2(i: Int): Int = {
        val a = t.charAt(i) - '0'; val b = t.charAt(i + 1) - '0'
        if (a < 0 || a > 9 || b < 0 || b > 9) { ok = false; 0 } else a * 10 + b
      }
      val y = d2(0) * 100 + d2(2)
      val mo = d2(5); val dd = d2(8)
      val hh = d2(11); val mi = d2(14); val ss = d2(17)
      if (ok && mo >= 1 && mo <= 12 && dd >= 1 && dd <= 31 &&
          hh <= 23 && mi <= 59 && ss <= 59) {
        val r = Try(java.time.LocalDateTime.of(y, mo, dd, hh, mi, ss)
          .toInstant(java.time.ZoneOffset.UTC)).toOption
        if (r.isDefined) return r
      }
    }
    Try(Instant.parse(t)).toOption.orElse(
      Try(java.time.OffsetDateTime.parse(t, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant).toOption)
  }

  // The two obsolete HTTP date formats recipients MUST accept
  // (RFC 9110 §5.6.7) besides IMF-fixdate: RFC-850
  // ("Sunday, 06-Nov-94 08:49:37 GMT") and C asctime
  // ("Sun Nov  6 08:49:37 1994", implied GMT). Last-Modified headers
  // from legacy servers still use both. Two-digit years use base 1969 so
  // the mapped range [1969, 2068] reproduces the reference's
  // email.utils pivot exactly (yy>68 -> 1900s, else 2000s — Java's
  // conventional 1970 base would send '69' to 2069 instead of 1969).
  private val Rfc850Format = new java.time.format.DateTimeFormatterBuilder()
    .parseCaseInsensitive()
    .appendPattern("EEEE, dd-MMM-")
    .appendValueReduced(java.time.temporal.ChronoField.YEAR, 2, 2, 1969)
    .appendPattern(" HH:mm:ss zz")
    .toFormatter(java.util.Locale.US)
  private val AsctimeFormat = new java.time.format.DateTimeFormatterBuilder()
    .parseCaseInsensitive()
    .appendPattern("EEE MMM")
    .padNext(3)
    .appendValue(java.time.temporal.ChronoField.DAY_OF_MONTH)
    .appendPattern(" HH:mm:ss yyyy")
    .toFormatter(java.util.Locale.US)

  /** RFC-2822 / RFC-1123 HTTP dates, plus the obsolete RFC-850 and
    * asctime forms (warc.pyx:663-691: `parsedate_to_datetime`, which
    * accepts all three).
    */
  def parseHttpDate(s: String): Option[Instant] = {
    val t = s.trim
    Try(java.time.ZonedDateTime.parse(t, DateTimeFormatter.RFC_1123_DATE_TIME).toInstant).toOption
      .orElse(Try(java.time.ZonedDateTime.parse(t, Rfc850Format).toInstant).toOption)
      .orElse(Try(java.time.LocalDateTime.parse(t, AsctimeFormat)
        .toInstant(java.time.ZoneOffset.UTC)).toOption)
  }
}

/** HTTP message splitting: header block off payload, Latin-1
  * (iso-8859-15, warc.pyx:775) header decoding, status-line derivations
  * (warc.pyx:261-287).
  */
object HttpParser {
  private val Latin = java.nio.charset.Charset.forName("ISO-8859-15")

  /** Find the end of the header block: \r\n\r\n (or tolerant \n\n).
    * Returns (headerEndExclusive, bodyStart) or None if no split found.
    */
  private def findSplit(content: Array[Byte]): Option[(Int, Int)] = {
    var i = 0
    while (i + 1 < content.length) {
      if (content(i) == '\n') {
        if (content(i + 1) == '\n') return Some((i + 1, i + 2))
        if (i + 2 < content.length && content(i + 1) == '\r' && content(i + 2) == '\n')
          return Some((i + 1, i + 3))
      }
      i += 1
    }
    None
  }

  def parse(content: Array[Byte]): Option[HttpMessage] = {
    if (content.isEmpty) return None
    val (headerEnd, bodyStart) = findSplit(content).getOrElse((content.length, content.length))
    val headerText = new String(content, 0, headerEnd, Latin)
    val lines = headerText.split("\r?\n")
    if (lines.isEmpty) return None
    val statusLine = lines(0).trim
    val looksHttp = statusLine.startsWith("HTTP/") || statusLine.contains(" HTTP/")
    if (!looksHttp) return None
    var entries = Vector.empty[(String, String)]
    var i = 1
    while (i < lines.length) {
      val s = lines(i)
      if (s.nonEmpty) {
        if ((s.charAt(0) == ' ' || s.charAt(0) == '\t') && entries.nonEmpty) {
          val (k, v) = entries.last
          entries = entries.init :+ (k -> (v + " " + s.trim))
        } else {
          val colon = s.indexOf(':')
          if (colon > 0)
            entries = entries :+ (s.substring(0, colon).trim -> s.substring(colon + 1).trim)
        }
      }
      i += 1
    }
    val (status, reason) =
      if (statusLine.startsWith("HTTP/")) {
        val parts = statusLine.split(" ", 3)
        val st = if (parts.length >= 2) Try(parts(1).toInt).toOption else None
        val rs = if (parts.length >= 3) Some(parts(2)) else None
        (st, rs)
      } else (None, None)
    val body = java.util.Arrays.copyOfRange(content, bodyStart, content.length)
    Some(HttpMessage(statusLine, status, reason, HeaderMap(entries), body))
  }
}
