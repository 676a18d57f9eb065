package graft.core

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import scala.util.Try

/** Encoding detection and resilient decoding for noisy web payloads —
  * behavioral parity with the reference's encoding module
  * (resiliparse-py/resiliparse/parse/encoding.pyx:45-406), detector
  * backend swapped from uchardet to ICU4J CharsetDetector (the engine
  * available on the Spark classpath).
  *
  * Canonical encoding names follow the reference's WHATWG-derived set
  * (encoding.pyx:45-113) so results are comparable across engines;
  * [[javaCharset]] resolves a canonical name to a JVM Charset for
  * decoding.
  */
object Encodings {

  /** WHATWG label -> canonical name map
    * (https://encoding.spec.whatwg.org/#names-and-labels), with the
    * reference's documented deltas (encoding.pyx:38-44): ISO-8859-8-I →
    * iso8859-8, WINDOWS-874 → iso8859-11, no x-mac-cyrillic /
    * x-user-defined / replacement.
    */
  private val whatwg: Map[String, String] = {
    // label groups, WHATWG §4.2 order
    def g(canonical: String, labels: String*) = labels.map(_ -> canonical)
    (g("cp1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1", "ibm819",
        "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987",
        "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252") ++
     g("cp866", "866", "cp866", "csibm866", "ibm866") ++
     g("iso8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592",
        "iso_8859-2", "iso_8859-2:1987", "l2", "latin2") ++
     g("iso8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593",
        "iso_8859-3", "iso_8859-3:1988", "l3", "latin3") ++
     g("iso8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594",
        "iso_8859-4", "iso_8859-4:1988", "l4", "latin4") ++
     g("iso8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144", "iso8859-5",
        "iso88595", "iso_8859-5", "iso_8859-5:1988") ++
     g("iso8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i", "csisolatinarabic",
        "ecma-114", "iso-8859-6", "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127", "iso8859-6",
        "iso88596", "iso_8859-6", "iso_8859-6:1987") ++
     g("iso8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8", "iso-8859-7",
        "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek") ++
     g("iso8859-8", "csiso88598e", "csiso88598i", "csisolatinhebrew", "hebrew", "iso-8859-8",
        "iso-8859-8-e", "iso-8859-8-i", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8",
        "iso_8859-8:1988", "logical", "visual") ++
     g("iso8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10", "iso885910",
        "l6", "latin6") ++
     g("iso8859-11", "dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620",
        "windows-874") ++
     g("iso8859-13", "iso-8859-13", "iso8859-13", "iso885913") ++
     g("iso8859-14", "iso-8859-14", "iso8859-14", "iso885914") ++
     g("iso8859-15", "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15",
        "l9") ++
     g("iso8859-16", "iso-8859-16", "iso8859-16", "iso885916") ++
     g("cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9", "iso88599",
        "iso_8859-9", "iso_8859-9:1989", "l5", "latin5", "cp1254", "windows-1254", "x-cp1254") ++
     g("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r") ++
     g("koi8-u", "koi8-ru", "koi8-u") ++
     g("mac-roman", "csmacintosh", "mac", "macintosh", "x-mac-roman", "mac-roman") ++
     g("cp1250", "cp1250", "windows-1250", "x-cp1250") ++
     g("cp1251", "cp1251", "windows-1251", "x-cp1251") ++
     g("cp1253", "cp1253", "windows-1253", "x-cp1253") ++
     g("cp1255", "cp1255", "windows-1255", "x-cp1255") ++
     g("cp1256", "cp1256", "windows-1256", "x-cp1256") ++
     g("cp1257", "cp1257", "windows-1257", "x-cp1257") ++
     g("cp1258", "cp1258", "windows-1258", "x-cp1258") ++
     g("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312", "gb_2312-80",
        "gbk", "iso-ir-58", "x-gbk") ++
     g("gb18030", "gb18030") ++
     g("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5") ++
     g("euc_jp", "cseucpkdfmtjapanese", "euc-jp", "euc_jp", "x-euc-jp") ++
     g("iso2022_jp", "csiso2022jp", "iso-2022-jp", "iso2022_jp") ++
     g("shift_jis", "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis", "sjis",
        "windows-31j", "x-sjis") ++
     g("euc_kr", "cseuckr", "csksc56011987", "euc-kr", "euc_kr", "iso-ir-149", "korean",
        "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949") ++
     g("utf-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8", "utf8",
        "x-unicode20utf8") ++
     g("utf-16-be", "unicodefffe", "utf-16be", "utf-16-be") ++
     g("utf-16-le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode", "unicodefeff",
        "utf-16", "utf-16le", "utf-16-le")).toMap
  }

  /** Map an encoding label to its canonical HTML5 name
    * (encoding.pyx:261-302). Unknown labels fall back to utf-8 (or None).
    */
  def mapToHtml5(label: String, fallbackUtf8: Boolean = true): Option[String] = {
    val canon = whatwg.get(label.trim.toLowerCase)
    if (fallbackUtf8) canon.orElse(Some("utf-8")) else canon
  }

  /** Canonical name -> JVM Charset. */
  def javaCharset(canonical: String): Option[Charset] = {
    val name = canonical match {
      case "cp1250" => "windows-1250"
      case "cp1251" => "windows-1251"
      case "cp1252" => "windows-1252"
      case "cp1253" => "windows-1253"
      case "cp1254" => "windows-1254"
      case "cp1255" => "windows-1255"
      case "cp1256" => "windows-1256"
      case "cp1257" => "windows-1257"
      case "cp1258" => "windows-1258"
      case "cp866" => "IBM866"
      case "mac-roman" => "x-MacRoman"
      case "euc_jp" => "EUC-JP"
      case "euc_kr" => "EUC-KR"
      case "iso2022_jp" => "ISO-2022-JP"
      case "shift_jis" => "Shift_JIS"
      case "iso8859-11" => "TIS-620"
      case "utf-16-le" => "UTF-16LE"
      case "utf-16-be" => "UTF-16BE"
      case s if s.startsWith("iso8859-") => "ISO-8859-" + s.stripPrefix("iso8859-")
      case other => other
    }
    Try(Charset.forName(name)).toOption
  }

  /** Per-thread ICU detector (the reference keeps one global uchardet
    * instance, encoding.pyx:254-258; executors are multi-threaded here).
    */
  private val detector = new ThreadLocal[com.ibm.icu.text.CharsetDetector] {
    override def initialValue() = new com.ibm.icu.text.CharsetDetector()
  }

  /** `<meta charset=...>` / `<meta http-equiv content=...charset=...>`
    * ASCII probe over the first `peek` bytes (encoding.pyx:238-249).
    */
  private val MetaCharsetRe =
    """(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9._:()-]+)""".r

  def htmlMetaCharset(data: Array[Byte], peek: Int = 1024): Option[String] = {
    val n = math.min(data.length, peek)
    val head = new String(data, 0, n, StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head)
      .flatMap(m => mapToHtml5(m.group(1), fallbackUtf8 = false))
  }

  /** data[from,to) validates as UTF-8. `lenientEnds` tolerates a
    * truncated multi-byte sequence at either boundary (the head/tail
    * sample seams cut mid-character); the bytes that ARE present must
    * still be a valid prefix/suffix. Returns -1 for invalid, else the
    * count of bytes >= 0x80 seen (0 == pure ASCII).
    */
  private def utf8HighBytes(data: Array[Byte], from: Int, to: Int,
      lenientStart: Boolean, lenientEnd: Boolean): Int = {
    var i = from
    var high = 0
    // leading-orphan skip applies ONLY when `from` is a sampling seam
    // (the tail half starts mid-document, possibly mid-character); the
    // head half starts at the true document start, where an orphan
    // continuation byte is genuinely invalid UTF-8
    if (lenientStart) {
      var skipped = 0
      while (i < to && skipped < 3 && (data(i) & 0xc0) == 0x80) { i += 1; skipped += 1; high += 1 }
    }
    while (i < to) {
      val b = data(i) & 0xff
      if (b < 0x80) i += 1
      else {
        high += 1
        // continuation count + first-continuation range per RFC 3629
        val n =
          if (b >= 0xc2 && b <= 0xdf) 1
          else if (b >= 0xe0 && b <= 0xef) 2
          else if (b >= 0xf0 && b <= 0xf4) 3
          else return -1
        var j = i + 1
        val end = math.min(i + 1 + n, to)
        while (j < end) {
          val c = data(j) & 0xff
          val ok =
            if (j == i + 1) b match {
              case 0xe0 => c >= 0xa0 && c <= 0xbf
              case 0xed => c >= 0x80 && c <= 0x9f // no surrogates
              case 0xf0 => c >= 0x90 && c <= 0xbf
              case 0xf4 => c >= 0x80 && c <= 0x8f // <= U+10FFFF
              case _ => (c & 0xc0) == 0x80
            } else (c & 0xc0) == 0x80
          if (!ok) return -1
          high += 1
          j += 1
        }
        if (i + 1 + n > to && !lenientEnd) return -1 // truncated at hard end
        i += 1 + n
      }
    }
    high
  }

  /** Detect the charset of a byte string (encoding.pyx:196-258): optional
    * HTML meta probe in the first 1 KiB, then a deterministic UTF-8
    * validity fast path, then statistical detection over a head+tail
    * sample of at most `maxLen` bytes, then WHATWG remap with UTF-8
    * fallback.
    *
    * The fast path: content containing high bytes that validates as
    * UTF-8 end-to-end IS UTF-8 — legacy-encoded text is statistically
    * never valid multi-byte UTF-8, and a linear validity scan is ~100×
    * cheaper than the ICU detector. Pure ASCII is left on the
    * statistical path so the pinned ASCII→cp1252 divergence (and ESC-
    * based ISO-2022-JP detection) is preserved — see
    * EncodingDivergenceSpec.
    */
  def detectEncoding(
      data: Array[Byte],
      maxLen: Int = 131072,
      html5Compatible: Boolean = true,
      fromHtmlMeta: Boolean = false): Option[String] = {
    if (fromHtmlMeta) {
      val meta = htmlMetaCharset(data)
      if (meta.isDefined) return meta
    }
    if (data.length > 0) {
      val sampled = maxLen > 0 && data.length > maxLen
      val half = (maxLen + 1) / 2
      val utf8High =
        if (sampled) {
          // head: true document start (strict), seam at its end (lenient);
          // tail: seam at its start (lenient), true document end (strict)
          val head = utf8HighBytes(data, 0, half,
            lenientStart = false, lenientEnd = true)
          if (head < 0) -1
          else {
            val tail = utf8HighBytes(data, data.length - half, data.length,
              lenientStart = true, lenientEnd = false)
            if (tail < 0) -1 else head + tail
          }
        } else utf8HighBytes(data, 0, data.length,
          lenientStart = false, lenientEnd = false)
      if (utf8High > 0) return Some("utf-8")
      // second deterministic shortcut: clean (mostly-)ASCII content —
      // no NULs (UTF-16 pattern), no ESC (ISO-2022-*), no "~{" (HZ),
      // and <2% high bytes that failed UTF-8 validation — is the
      // cp1252-family answer ICU gives on exactly this evidence, at
      // ~100× the cost. Denser/structured content falls through to the
      // full detector. Divergence delta 3 in EncodingDivergenceSpec.
      if (html5Compatible) {
        def clean(from: Int, to: Int): Int = { // high count, or -1 if disqualified
          var i = from; var high = 0
          while (i < to) {
            val b = data(i) & 0xff
            if (b == 0x00 || b == 0x1b) return -1
            if (b == '~' && i + 1 < to && data(i + 1) == '{') return -1
            if (b >= 0x80) high += 1
            i += 1
          }
          high
        }
        val sampleLen = if (sampled) 2L * half else data.length.toLong
        val high =
          if (sampled) {
            val h = clean(0, half)
            if (h < 0) -1 else {
              val t = clean(data.length - half, data.length)
              if (t < 0) -1 else h + t
            }
          } else clean(0, data.length)
        if (high >= 0 && high * 50L < sampleLen) return Some("cp1252")
      }
    }
    val sample =
      if (maxLen > 0 && data.length > maxLen) {
        val half = (maxLen + 1) / 2
        val out = new Array[Byte](half * 2)
        System.arraycopy(data, 0, out, 0, half)
        System.arraycopy(data, data.length - half, out, half, half)
        out
      } else data
    val raw: Option[String] =
      if (sample.isEmpty) None
      else if (looksLikeThai(sample)) Some("tis-620")
      else Try {
        val det = detector.get()
        // Markup-dilution guard: ICU's single-byte recognizers score
        // byte n-grams over the WHOLE input, so a page that is 80% ASCII
        // markup/JS around 20% Cyrillic ranks ISO-8859-1 above
        // windows-1251 (fixture record 39775). uchardet — the
        // reference's backend, encoding.pyx:196-258 — is robust to this.
        // Condensing to high-byte runs plus a little ASCII context
        // restores the legacy-script signal; dense legacy text (and all
        // multi-byte CJK) is unaffected because condensing barely
        // changes it. Only engaged when there is a meaningful non-ASCII
        // signal (>=16 high bytes, >=64 condensed bytes).
        val condensed = condenseHighBytes(sample)
        det.setText(if (condensed.length >= 64) condensed else sample)
        Option(det.detect()).map(_.getName)
      }.toOption.flatten
    if (html5Compatible) Some(raw.flatMap(n => whatwg.get(n.trim.toLowerCase)).getOrElse("utf-8"))
    else raw.map(_.toLowerCase)
  }

  /** High-byte context extraction for the markup-dilution guard: keep
    * every byte within `ctx` positions of a >=0x80 byte, drop the long
    * pure-ASCII runs between them. Returns empty when the high-byte
    * signal is too thin (<16 high bytes) — callers then detect on the
    * raw sample.
    */
  private def condenseHighBytes(data: Array[Byte], ctx: Int = 12): Array[Byte] = {
    var high = 0
    var i = 0
    while (i < data.length) { if ((data(i) & 0xff) >= 0x80) high += 1; i += 1 }
    if (high < 16) return Array.emptyByteArray
    val keep = new Array[Boolean](data.length)
    i = 0
    while (i < data.length) {
      if ((data(i) & 0xff) >= 0x80) {
        var j = math.max(0, i - ctx)
        val end = math.min(data.length, i + ctx + 1)
        while (j < end) { keep(j) = true; j += 1 }
      }
      i += 1
    }
    val out = new Array[Byte](keep.count(identity))
    var k = 0
    i = 0
    while (i < data.length) {
      if (keep(i)) { out(k) = data(i); k += 1 }
      i += 1
    }
    out
  }

  /** Structural TIS-620 (Thai) detector. ICU's CharsetDetector carries no
    * Thai recognizer at all — genuine TIS-620 text comes back as euc_jp
    * garbage — while the reference's uchardet detects it natively
    * (resiliparse-py/resiliparse/parse/encoding.pyx:196-258). Thai
    * orthography gives a strict byte-level signature no other single-byte
    * script satisfies: every high byte sits in the TIS-620 Thai block,
    * combining marks (upper/lower vowels and tone marks) appear at Thai
    * frequency but ONLY after a Thai base character — whereas real
    * Cyrillic/Greek/Hebrew/Arabic text places word-INITIAL letters on
    * those same byte values (и=0xE8, η=0xE7, י=0xE9, ش=0xD4 …), failing
    * the positional test on the first word boundary. Runs before ICU;
    * a false here costs one linear scan of the sample.
    */
  private def looksLikeThai(sample: Array[Byte]): Boolean = {
    var high = 0; var cons = 0; var comb = 0
    var prevThaiBase = false
    var i = 0
    while (i < sample.length) {
      val b = sample(i) & 0xff
      if (b >= 0x80) {
        // outside the TIS-620 assignment (incl. the 0xDB-0xDE gap) → not Thai
        if (b < 0xa1 || b > 0xfb || (b >= 0xdb && b <= 0xde)) return false
        high += 1
        val isCons = b <= 0xce                       // ก..ฮ
        val isComb = b == 0xd1 || (b >= 0xd4 && b <= 0xda) ||
          (b >= 0xe7 && b <= 0xee)                   // upper/lower vowels, tones
        if (isCons) cons += 1
        if (isComb) { if (!prevThaiBase) return false; comb += 1 }
        // marks stack (vowel-above + tone); spacing vowels ะ า ำ also carry tones
        prevThaiBase = isCons || isComb || b == 0xd0 || b == 0xd2 || b == 0xd3
      } else prevThaiBase = false
      i += 1
    }
    // Thai text: consonants dominate, combining marks common (≥5%)
    high >= 16 && cons * 2 >= high && comb * 20L >= high
  }

  private def hasUtf16Bom(data: Array[Byte]): Boolean =
    data.length >= 2 &&
      (((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xfe) ||
       ((data(0) & 0xff) == 0xfe && (data(1) & 0xff) == 0xff))

  private def stripBomBytes(data: Array[Byte], canonical: String): Array[Byte] = {
    def drop(n: Int) = java.util.Arrays.copyOfRange(data, n, data.length)
    if (canonical == "utf-8" && data.length >= 3 &&
        (data(0) & 0xff) == 0xef && (data(1) & 0xff) == 0xbb && (data(2) & 0xff) == 0xbf) drop(3)
    else data // utf-16 BOMs are consumed by the BOM-aware UTF-16 decoder
  }

  /** A utf-16 payload carrying a BOM must decode per the BOM, not the
    * labeled endianness (the reference gets this via Python's 'utf-16'
    * codec — __map_utf, encoding.pyx:309-320).
    */
  private def effectiveCharset(canonical: String, data: Array[Byte]): Option[Charset] =
    if (canonical.startsWith("utf-16") && hasUtf16Bom(data))
      Try(Charset.forName("UTF-16")).toOption
    else javaCharset(canonical)

  private def decodeStrict(data: Array[Byte], cs: Charset): Option[String] = {
    // UTF-8 fast path: validate in one allocation-free scan, then let the
    // intrinsified String constructor do the decode. The CharsetDecoder
    // route costs a CharBuffer + a toString copy per attempt and runs the
    // generic decodeLoop — 2-3x slower on the (dominant) valid-utf-8 case.
    if (cs eq StandardCharsets.UTF_8) {
      if (isValidUtf8(data)) Some(new String(data, StandardCharsets.UTF_8)) else None
    } else {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Try(dec.decode(java.nio.ByteBuffer.wrap(data)).toString).toOption
    }
  }

  /** Strict RFC 3629 well-formedness: rejects overlongs, surrogates
    * (U+D800..DFFF), code points above U+10FFFF, and truncated tails —
    * exactly the inputs a REPORT-mode JDK UTF-8 decoder rejects.
    */
  private[core] def isValidUtf8(data: Array[Byte]): Boolean = {
    val n = data.length
    var i = 0
    while (i < n) {
      // ASCII run fast path: 8 bytes per test via sign-bit OR
      while (i + 8 <= n &&
          (data(i) | data(i + 1) | data(i + 2) | data(i + 3) |
           data(i + 4) | data(i + 5) | data(i + 6) | data(i + 7)) >= 0) i += 8
      if (i >= n) return true
      val b0 = data(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2) return false // continuation or overlong lead
      else if (b0 < 0xe0) {            // 2-byte
        if (i + 1 >= n || (data(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b0 < 0xf0) {          // 3-byte
        if (i + 2 >= n) return false
        val b1 = data(i + 1) & 0xff
        val lo = if (b0 == 0xe0) 0xa0 else 0x80 // no overlongs
        val hi = if (b0 == 0xed) 0x9f else 0xbf // no surrogates
        if (b1 < lo || b1 > hi || (data(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (b0 < 0xf5) {          // 4-byte
        if (i + 3 >= n) return false
        val b1 = data(i + 1) & 0xff
        val lo = if (b0 == 0xf0) 0x90 else 0x80 // no overlongs
        val hi = if (b0 == 0xf4) 0x8f else 0xbf // cap at U+10FFFF
        if (b1 < lo || b1 > hi || (data(i + 2) & 0xc0) != 0x80 ||
            (data(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false              // f5..ff never valid
    }
    true
  }

  /** Resilient decode ladder (encoding.pyx:305-367): try `encoding`, then
    * the fallbacks (utf-8, cp1252), else decode with replacement/ignore so
    * the result is always a sane, re-encodable string. BOMs stripped.
    */
  def bytesToStr(
      data: Array[Byte],
      encoding: String = "utf-8",
      fallbackEncodings: Seq[String] = Seq("utf-8", "cp1252"),
      stripBom: Boolean = true): String = {
    val primary = mapToHtml5(encoding, fallbackUtf8 = false).getOrElse(encoding)
    val candidates = (primary +: fallbackEncodings.map(f =>
      mapToHtml5(f, fallbackUtf8 = false).getOrElse(f))).distinct
    candidates.foreach { canon =>
      // guard cancellation point between decode attempts: each attempt
      // over a large body is a multi-MB allocation burst
      MemGuard.poll()
      effectiveCharset(canon, data).foreach { cs =>
        val d = if (stripBom) stripBomBytes(data, canon) else data
        decodeStrict(d, cs) match {
          case Some(s) => return s
          case None =>
        }
      }
    }
    val cs = effectiveCharset(primary, data).getOrElse(StandardCharsets.UTF_8)
    val d = if (stripBom) stripBomBytes(data, primary) else data
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    Try(dec.decode(java.nio.ByteBuffer.wrap(d)).toString)
      .getOrElse(new String(d, StandardCharsets.UTF_8))
  }

  /** MIME magic table (standard public magic numbers; same inventory as
    * the reference's table, resiliparse-py/resiliparse/parse/encoding.h).
    * Checked in order against the raw head AND the whitespace-stripped
    * head, with XHTML/SVG refinement (encoding.pyx:370-406).
    */
  private val MimeMagic: Seq[(Array[Byte], String)] = {
    def s(x: String) = x.getBytes(StandardCharsets.ISO_8859_1)
    def b(x: Int*) = x.map(_.toByte).toArray
    Seq(
      b(0xEF, 0xBB, 0xBF) -> "text/plain",
      b(0xFF, 0xFE) -> "text/plain",
      b(0xFE, 0xFF) -> "text/plain",
      b(0x0E, 0xFE, 0xFF) -> "text/plain",
      s("+/v8") -> "text/plain", s("+/v9") -> "text/plain",
      s("+/v+") -> "text/plain", s("+/v/") -> "text/plain",
      s("<!DOCTYPE html") -> "text/html", s("<!DOCTYPE HTML") -> "text/html",
      s("<!doctype html") -> "text/html", s("<!doctype HTML") -> "text/html",
      s("<!DOCTYPE svg") -> "image/svg+xml", s("<!doctype svg") -> "image/svg+xml",
      s("<!DOCTYPE SVG") -> "image/svg+xml", s("<!doctype SVG") -> "image/svg+xml",
      s("<?xml ") -> "application/xml",
      b(0x00, '<', 0x00, '?', 0x00, 'x', 0x00, 'm', 0x00, 'l', 0x00, ' ') -> "application/xml",
      s("{\\rtf1") -> "application/rtf",
      b(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1) -> "application/msword",
      b(0xFF, 0xD8, 0xFF, 0xE0) -> "image/jpeg",
      b(0xFF, 0xD8, 0xFF, 0xE1) -> "image/jpeg",
      b(0xFF, 0xD8, 0xFF, 0xE2) -> "image/jpeg",
      b(0xFF, 0xD8, 0xFF, 0xE8) -> "image/jpeg",
      b(0xFF, 0xD8, 0xFF, 0xEE) -> "image/jpeg",
      b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) -> "image/png",
      s("GIF87a") -> "image/gif", s("GIF89a") -> "image/gif",
      b(0x49, 0x49, 0x2A, 0x00) -> "image/tiff",
      b(0x4D, 0x4D, 0x00, 0x2A) -> "image/tiff",
      b(0x00, 0x00, 0x01, 0x00) -> "image/x-icon",
      s("icns") -> "image/icns",
      b(0x00, 0x00, 0x00, 0x0C, 0x6A, 0x50, 0x20, 0x20, 0x0D, 0x0A, 0x87, 0x0A) -> "image/jp2",
      b(0xFF, 0x4F, 0xFF, 0x51) -> "image/jp2",
      s("BM") -> "image/bmp",
      s("RIFF") -> "image/webp",
      s("/* XPM */") -> "image/x-xpixmap",
      s("%PDF-") -> "application/pdf",
      s("%!PS") -> "application/postscript",
      s("8BPS") -> "image/vnd.adobe.photoshop",
      s("PK") -> "application/zip",
      s("PK") -> "application/zip",
      s("PK") -> "application/zip",
      b('u', 's', 't', 'a', 'r', 0x00, '0', '0') -> "application/x-tar",
      b('u', 's', 't', 'a', 'r', ' ', ' ', 0x00) -> "application/x-tar",
      b(0x37, 0x7A, 0xBC, 0xAF, 0x27, 0x1C) -> "application/x-7z-compressed",
      b(0x1F, 0x8B) -> "application/gzip",
      s("INDX") -> "application/x-bzip2",
      s("BZh") -> "application/x-bzip2",
      b(0x04, 0x22, 0x4D, 0x18) -> "application/x-lz4",
      b(0xFD, 0x37, 0x7A, 0x58, 0x5A, 0x00) -> "application/x-xz",
      b('R', 'a', 'r', '!', 0x1A, 0x07, 0x00) -> "application/vnd.rar",
      b('R', 'a', 'r', '!', 0x1A, 0x07, 0x01, 0x00) -> "application/vnd.rar",
      s("wOFF") -> "font/woff", s("wOF2") -> "font/woff2",
      b(0x00, 0x01, 0x00, 0x00, 0x00) -> "font/ttf",
      s("KCMS") -> "application/vnd.iccprofile",
      s("OggS") -> "application/ogg",
      s("fLaC") -> "audio/flac",
      s("FORM") -> "audio/aiff",
      b(0xFF, 0xFB) -> "audio/mpeg",
      b(0xFF, 0xF2) -> "audio/mpeg",
      s("ID3") -> "audio/mpeg",
      s("ftypisom") -> "video/mp4",
      b(0x00, 0x00, 0x01, 0xB3) -> "video/mpeg",
      b(0x1A, 0x45, 0xDF, 0xA3) -> "video/x-matroska",
      b(0x00, 0x00, 0x01, 0xBA) -> "video/mpeg",
      s("CWS") -> "application/x-shockwave-flash",
      s("FWS") -> "application/x-shockwave-flash",
      b(0x7F, 'E', 'L', 'F') -> "application/x-elf",
      s("MSCF") -> "application/vnd.ms-cab-compressed",
      s("CD001") -> "application/x-iso9660-image",
      b(0xFE, 0xED, 0xFA, 0xCE) -> "application/x-mach-binary",
      b(0xFE, 0xED, 0xFA, 0xCF) -> "application/x-mach-binary",
      b(0xCE, 0xFA, 0xED, 0xFE) -> "application/x-mach-binary",
      b(0xCF, 0xFA, 0xED, 0xFE) -> "application/x-mach-binary",
      b(0x00, 'a', 's', 'm') -> "application/wasm",
      s("!<arch>\n") -> "application/vnd.debian.binary-package",
      b(0xCA, 0xFE, 0xBA, 0xBE) -> "application/java-vm")
  }

  private def startsWith(data: Array[Byte], from: Int, magic: Array[Byte]): Boolean = {
    if (data.length - from < magic.length) return false
    var i = 0
    while (i < magic.length) {
      if (data(from + i) != magic(i)) return false
      i += 1
    }
    true
  }

  /** Magic-bytes MIME sniff + XHTML/SVG refinement + unprintable-ratio
    * text/binary split (encoding.pyx:370-406).
    */
  def detectMime(data: Array[Byte], maxUnprintable: Double = 0.05): String = {
    // whitespace-stripped view of the first 128 bytes
    var stripFrom = 0
    val head = math.min(data.length, 128)
    while (stripFrom < head && (data(stripFrom) == ' ' || data(stripFrom) == '\t' ||
           data(stripFrom) == '\n' || data(stripFrom) == '\r' || data(stripFrom) == 0x0b ||
           data(stripFrom) == 0x0c)) stripFrom += 1
    val stripped = new String(data, stripFrom, math.min(data.length - stripFrom, 128),
      StandardCharsets.ISO_8859_1)
    MimeMagic.foreach { case (magic, mime) =>
      if (startsWith(data, 0, magic) || startsWith(data, stripFrom, magic)) {
        if (mime == "text/html" || mime == "application/xml") {
          if (stripped.contains("\"-//W3C//DTD XHTML")) return "application/xhtml+xml"
          if (mime == "application/xml" &&
              (stripped.contains("<svg ") || stripped.contains("\"-//W3C//DTD SVG")))
            return "image/svg+xml"
        }
        return mime
      }
    }
    var unprintable = 0L
    var i = 0
    val limit = data.length * maxUnprintable
    while (i < data.length) {
      val b = data(i) & 0xff
      if (b <= 0x1f || b >= 0x7f) {
        unprintable += 1
        if (unprintable > limit) return "application/octet-stream"
      }
      i += 1
    }
    "text/plain"
  }
}
