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

  /** Decode character references in `s`. Tolerant: missing semicolons are
    * accepted for named entities; invalid references stay verbatim.
    */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new StringBuilder(s.length)
    sb.append(s.substring(0, i))
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else if (i + 1 < n && s.charAt(i + 1) == '#') {
        // numeric: &#123; or &#x1F;
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        while (j < n && Character.digit(s.charAt(j), if (hex) 16 else 10) >= 0) j += 1
        if (j > start && j - start <= 8) {
          val cp = try Integer.parseInt(s.substring(start, j), if (hex) 16 else 10)
                   catch { case _: NumberFormatException => -1 }
          if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
            // Windows-1252 remap for the C1 range, per HTML5 tokenizer
            val mapped = if (cp >= 0x80 && cp <= 0x9f) Cp1252C1.getOrElse(cp, cp) else cp
            sb.appendAll(Character.toChars(if (mapped == 0) 0xfffd else mapped))
            i = if (j < n && s.charAt(j) == ';') j + 1 else j
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else {
        // named: longest match up to 10 chars
        var j = i + 1
        val limit = math.min(n, i + 12)
        while (j < limit && Character.isLetterOrDigit(s.charAt(j))) j += 1
        val name = s.substring(i + 1, j)
        named.get(name) match {
          case Some(rep) =>
            sb.append(rep)
            i = if (j < n && s.charAt(j) == ';') j + 1 else j
          case None => sb.append(c); i += 1
        }
      }
    }
    sb.toString
  }

  /** HTML5 numeric-reference remap of C1 controls to Windows-1252. */
  private val Cp1252C1: Map[Int, Int] = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e, 0x85 -> 0x2026,
    0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6, 0x89 -> 0x2030, 0x8a -> 0x0160,
    0x8b -> 0x2039, 0x8c -> 0x0152, 0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019,
    0x93 -> 0x201c, 0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a, 0x9c -> 0x0153,
    0x9e -> 0x017e, 0x9f -> 0x0178)
}
