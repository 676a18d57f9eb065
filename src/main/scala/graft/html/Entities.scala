package graft.html

/** HTML character reference decoding (numeric + the named entities that
  * occur in real web text). Unknown references pass through verbatim —
  * the tolerant behavior HTML5 specifies for text content.
  */
object Entities {

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "shy" -> "­", "zwnj" -> "‌", "zwj" -> "‍",
    "copy" -> "©", "reg" -> "®", "trade" -> "™", "deg" -> "°", "plusmn" -> "±",
    "para" -> "¶", "sect" -> "§", "middot" -> "·", "bull" -> "•", "dagger" -> "†",
    "Dagger" -> "‡", "hellip" -> "…", "permil" -> "‰", "prime" -> "′", "Prime" -> "″",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
    "sbquo" -> "‚", "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "laquo" -> "«", "raquo" -> "»", "lsaquo" -> "‹", "rsaquo" -> "›",
    "times" -> "×", "divide" -> "÷", "minus" -> "−", "frasl" -> "⁄",
    "micro" -> "µ", "not" -> "¬", "curren" -> "¤", "cent" -> "¢", "pound" -> "£",
    "yen" -> "¥", "euro" -> "€", "frac14" -> "¼", "frac12" -> "½", "frac34" -> "¾",
    "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³", "ordf" -> "ª", "ordm" -> "º",
    "iexcl" -> "¡", "iquest" -> "¿", "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "acirc" -> "â", "atilde" -> "ã", "auml" -> "ä", "aring" -> "å", "aelig" -> "æ",
    "ccedil" -> "ç", "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï", "eth" -> "ð",
    "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô", "otilde" -> "õ",
    "ouml" -> "ö", "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "thorn" -> "þ", "yuml" -> "ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â", "Atilde" -> "Ã", "Auml" -> "Ä",
    "Aring" -> "Å", "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È", "Eacute" -> "É",
    "Ecirc" -> "Ê", "Euml" -> "Ë", "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "ETH" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocirc" -> "Ô", "Otilde" -> "Õ", "Ouml" -> "Ö", "Oslash" -> "Ø", "Ugrave" -> "Ù",
    "Uacute" -> "Ú", "Ucirc" -> "Û", "Uuml" -> "Ü", "Yacute" -> "Ý", "THORN" -> "Þ",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ", "delta" -> "δ", "epsilon" -> "ε",
    "lambda" -> "λ", "mu" -> "μ", "pi" -> "π", "sigma" -> "σ", "omega" -> "ω",
    "Omega" -> "Ω", "infin" -> "∞", "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓", "harr" -> "↔",
    "spades" -> "♠", "clubs" -> "♣", "hearts" -> "♥", "diams" -> "♦",
    "oelig" -> "œ", "OElig" -> "Œ", "scaron" -> "š", "Scaron" -> "Š", "fnof" -> "ƒ",
    "circ" -> "ˆ", "tilde" -> "˜", "acute" -> "´", "cedil" -> "¸", "uml" -> "¨",
    "macr" -> "¯", "brvbar" -> "¦", "star" -> "☆", "loz" -> "◊")

  /** Case-sensitive open-addressing table over the named-entity
    * vocabulary, probed straight off the input region — the per-`&`
    * `substring` + Map probe pair was measurable allocation on the
    * extraction hot path (entity-dense CJK pages).
    */
  private val TableSize = 1024 // power of two, ~6x the vocabulary
  private val nameTable = new Array[String](TableSize)
  private val replTable = new Array[String](TableSize)
  private def hashRegion(s: String, from: Int, to: Int): Int = {
    var h = 0
    var i = from
    while (i < to) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }
  private def regionEquals(name: String, s: String, from: Int, to: Int): Boolean = {
    if (name.length != to - from) return false
    var i = 0
    while (i < name.length) {
      if (s.charAt(from + i) != name.charAt(i)) return false
      i += 1
    }
    true
  }
  named.foreach { case (k, v) =>
    var slot = hashRegion(k, 0, k.length) & (TableSize - 1)
    while (nameTable(slot) != null) slot = (slot + 1) & (TableSize - 1)
    nameTable(slot) = k
    replTable(slot) = v
  }
  /** Replacement for the entity name at `s[from,to)`, or null. */
  private def lookupRegion(s: String, from: Int, to: Int): String = {
    if (to <= from) return null
    var slot = hashRegion(s, from, to) & (TableSize - 1)
    var probes = 0
    while (probes < TableSize) {
      val cand = nameTable(slot)
      if (cand == null) return null
      if (regionEquals(cand, s, from, to)) return replTable(slot)
      slot = (slot + 1) & (TableSize - 1)
      probes += 1
    }
    null
  }

  /** Decode character references in `s`. Tolerant: missing semicolons are
    * accepted for named entities; invalid references stay verbatim.
    */
  def decode(s: String): String = decodeRange(s, 0, s.length)

  /** [[decode]] over `s[from,to)` — callers holding a slice of a larger
    * input (the streaming extractor) skip the substring copy. Returns
    * `s` itself when the full range is reference-free.
    */
  def decodeRange(s: String, from: Int, to: Int): String = {
    // String.indexOf is a vectorized intrinsic — the char-at-a-time scan
    // to the first '&' was the single hottest parse-profile site on
    // entity-sparse markup (every attribute value passes through here)
    var i = s.indexOf('&', from)
    if (i < 0 || i >= to)
      return if (from == 0 && to == s.length) s else s.substring(from, to)
    val sb = new StringBuilder(to - from)
    sb.underlying.append(s, from, i)
    val n = to
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') {
        // bulk-copy to the next '&' (single chars through the builder
        // were the decode loop's hottest path on entity-sparse text)
        var j = s.indexOf('&', i + 1)
        if (j < 0 || j > n) j = n
        sb.underlying.append(s, i, j)
        i = j
      }
      else if (i + 1 < n && s.charAt(i + 1) == '#') {
        // numeric: &#123; or &#x1F; — parsed in place (no substring)
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        var cp = 0L
        while (j < n && {
          val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
          if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true } else false
        }) j += 1
        if (j > start && j - start <= 8 &&
            cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
          val cpi = cp.toInt
          // Windows-1252 remap for the C1 range, per HTML5 tokenizer
          val mapped = if (cpi >= 0x80 && cpi <= 0x9f) Cp1252C1(cpi - 0x80) else cpi
          sb.appendAll(Character.toChars(if (mapped == 0) 0xfffd else mapped))
          i = if (j < n && s.charAt(j) == ';') j + 1 else j
        } else { sb.append(c); i += 1 }
      } else {
        // named: longest match up to 10 chars
        var j = i + 1
        val limit = math.min(n, i + 12)
        while (j < limit && Character.isLetterOrDigit(s.charAt(j))) j += 1
        val rep = lookupRegion(s, i + 1, j)
        if (rep != null) {
          sb.append(rep)
          i = if (j < n && s.charAt(j) == ';') j + 1 else j
        } else { sb.append(c); i += 1 }
      }
    }
    sb.toString
  }

  /** HTML5 numeric-reference remap of C1 controls (0x80-0x9F) to
    * Windows-1252; identity for the unmapped five.
    */
  private val Cp1252C1: Array[Int] = {
    val m = Map(
      0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e, 0x85 -> 0x2026,
      0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6, 0x89 -> 0x2030, 0x8a -> 0x0160,
      0x8b -> 0x2039, 0x8c -> 0x0152, 0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201c, 0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a, 0x9c -> 0x0153,
      0x9e -> 0x017e, 0x9f -> 0x0178)
    Array.tabulate(32)(k => m.getOrElse(0x80 + k, 0x80 + k))
  }
}
