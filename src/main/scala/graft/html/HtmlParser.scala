package graft.html

import scala.collection.mutable

/** Tolerant HTML5-ish tokenizer + tree builder.
  *
  * Scope: the behaviors the reference's own tests pin
  * (tests/resiliparse/parse/test_html.py:60-115 quirks, structure
  * enforcement, RCDATA/raw-text elements) — not a spec-complete HTML5
  * parser (reference backend is lexbor; SURVEY §7 Phase 3 scopes parity
  * to the pipeline-used surface). Guarantees:
  *  - a document ALWAYS has html/head/body elements;
  *  - head-content elements before the body start go to head, everything
  *    else to body (unclosed head handled);
  *  - void elements never take children; raw-text (script/style) and
  *    RCDATA (title/textarea) contents are never tokenized as markup;
  *  - common implicit-close rules (p before block, li/dt/dd/tr/td/th,
  *    option) so real-world tag soup nests sanely;
  *  - never throws: any byte sequence yields a tree.
  */
/** Interned lowercase tag names looked up straight off the input string —
  * the tokenizer's per-tag `substring` + `toLowerCase` pair was a top
  * allocation source on the extraction hot path (two objects per tag,
  * tens of thousands of tags per document). The HTML tag vocabulary is a
  * small closed set, so a fixed open-addressing table over it resolves
  * ~100% of lookups allocation-free; unknown names (custom elements)
  * fall back to allocating.
  */
private[html] object TagNames {
  private val Size = 1024 // power of two, ~4x the vocabulary
  private val table = new Array[String](Size)

  private def hashRegion(s: String, from: Int, to: Int): Int = {
    var h = 0
    var i = from
    while (i < to) {
      var c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      h = h * 31 + c
      i += 1
    }
    h
  }

  private def regionEquals(name: String, s: String, from: Int, to: Int): Boolean = {
    if (name.length != to - from) return false
    var i = 0
    while (i < name.length) {
      var c = s.charAt(from + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c != name.charAt(i)) return false
      i += 1
    }
    true
  }

  // the full HTML living-standard element set plus legacy/foreign tags
  // that occur in crawl data
  Seq(
    "a", "abbr", "acronym", "address", "applet", "area", "article", "aside",
    "audio", "b", "base", "basefont", "bdi", "bdo", "big", "blink",
    "blockquote", "body", "br", "button", "canvas", "caption", "center",
    "cite", "code", "col", "colgroup", "data", "datalist", "dd", "del",
    "details", "dfn", "dialog", "dir", "div", "dl", "dt", "em", "embed",
    "fieldset", "figcaption", "figure", "font", "footer", "form", "frame",
    "frameset", "g", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "i", "iframe", "img", "input", "ins", "kbd",
    "label", "legend", "li", "link", "listing", "main", "map", "mark",
    "marquee", "math", "menu", "menuitem", "meta", "meter", "nav", "nobr",
    "noembed", "noframes", "noscript", "object", "ol", "optgroup", "option",
    "output", "p", "param", "path", "picture", "plaintext", "pre",
    "progress", "q", "rb", "rp", "rt", "rtc", "ruby", "s", "samp", "script",
    "search", "section", "select", "slot", "small", "source", "span",
    "strike", "strong", "style", "sub", "summary", "sup", "svg", "table",
    "tbody", "td", "template", "textarea", "tfoot", "th", "thead", "time",
    "title", "tr", "track", "tt", "u", "ul", "use", "var", "video", "wbr",
    "xmp").foreach { t =>
    var slot = hashRegion(t, 0, t.length) & (Size - 1)
    while (table(slot) != null) slot = (slot + 1) & (Size - 1)
    table(slot) = t
  }

  /** The lowercase tag name for `s[from, to)`: interned when known,
    * allocated otherwise.
    */
  def lookup(s: String, from: Int, to: Int): String = {
    var slot = hashRegion(s, from, to) & (Size - 1)
    var probes = 0
    while (probes < Size) {
      val cand = table(slot)
      if (cand == null) return s.substring(from, to).toLowerCase
      if (regionEquals(cand, s, from, to)) return cand
      slot = (slot + 1) & (Size - 1)
      probes += 1
    }
    s.substring(from, to).toLowerCase
  }
}

object HtmlParser {

  private[html] val HeadContent = Set("title", "base", "link", "meta", "style", "script", "noscript", "template")
  private[html] val RawText = Set("script", "style", "xmp", "noframes")
  private[html] val RcData = Set("title", "textarea")

  /** Elements whose start tag implicitly closes an open <p>. */
  private[html] val ClosesP = Set("address", "article", "aside", "blockquote", "details",
    "div", "dl", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p", "pre",
    "section", "table", "ul")

  /** tag -> set of open tags its start implicitly closes (nearest first). */
  private[html] val ImplicitClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "dt" -> Set("dt", "dd"), "dd" -> Set("dt", "dd"),
    "tr" -> Set("tr", "td", "th"), "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "option" -> Set("option"), "optgroup" -> Set("option", "optgroup"),
    "thead" -> Set("tr", "td", "th"), "tbody" -> Set("tr", "td", "th", "thead"),
    "tfoot" -> Set("tr", "td", "th", "tbody"))

  /** Open-element depth cap (browsers clamp around 512): beyond it, new
    * elements attach flat at the cap instead of nesting deeper. Keeps
    * every recursive consumer (text, serialize, traversal, selectors)
    * within stack bounds — a 100k-deep <div> bomb must not kill a task
    * with a StackOverflowError (Error, so no catch saves it).
    */
  private[html] val MaxDepth = 512

  /** Parse with an optional DOM node budget (MemGuard analog,
    * process_guard.pyx:184-533): every created node — element, text,
    * comment — counts against `maxNodes`; exceeding it throws
    * [[graft.core.MemGuardException]]. The DEPTH cap above bounds stack
    * use; this bounds HEAP use: DOM object overhead amplifies input
    * ~30-100x, so a budget of N nodes caps one record's tree at roughly
    * N * 100 bytes regardless of input size.
    */
  def parse(input: String, maxNodes: Int = Int.MaxValue): DomNode = {
    val doc = new DomNode(NodeType.Document, "#document")
    val htmlEl = new DomNode(NodeType.Element, "html")
    val headEl = new DomNode(NodeType.Element, "head")
    val bodyEl = new DomNode(NodeType.Element, "body")

    var nodeCount = 0
    def budget(): Unit = {
      nodeCount += 1
      if (nodeCount > maxNodes)
        throw new graft.core.MemGuardException(
          s"mem guard: DOM node budget $maxNodes exceeded")
    }

    var inBody = false // switched once body content starts
    var sawDoctype = false
    // open-element stack BELOW head/body (those are structural)
    val stack = mutable.ArrayBuffer.empty[DomNode]

    def currentParent: DomNode =
      if (stack.nonEmpty) stack.last else if (inBody) bodyEl else headEl

    def switchToBody(): Unit = if (!inBody) { stack.clear(); inBody = true }

    def insertText(raw0: String, decodeEntities: Boolean): Unit = {
      var raw = raw0
      if (raw.isEmpty) return
      // text before any body content: whitespace stays out of head/body
      // (dropped, matching inter-element whitespace handling); non-ws
      // text forces the body open.
      if (!inBody && stack.isEmpty) {
        if (raw.forall(_.isWhitespace)) return
        switchToBody()
      }
      val parent = currentParent
      // HTML5: a single newline immediately after a pre/textarea/listing
      // start tag is dropped
      if (parent.firstChild == null &&
          (parent.tag == "pre" || parent.tag == "textarea" || parent.tag == "listing")) {
        if (raw.startsWith("\r\n")) raw = raw.substring(2)
        else if (raw.startsWith("\n") || raw.startsWith("\r")) raw = raw.substring(1)
        if (raw.isEmpty) return
      }
      budget()
      val t = new DomNode(NodeType.Text, "#text")
      t.value = if (decodeEntities) Entities.decode(raw) else raw
      parent.appendChild(t)
    }

    val n = input.length
    var i = 0
    val textStart = new StringBuilder

    def flushText(): Unit = {
      if (textStart.nonEmpty) {
        insertText(textStart.toString, decodeEntities = true)
        textStart.clear()
      }
    }

    while (i < n) {
      val c = input.charAt(i)
      if (c != '<') {
        // bulk-append the whole text run up to the next tag open — the
        // per-char path made this loop the parser's hottest line
        var j = input.indexOf('<', i)
        if (j < 0) j = n
        textStart.underlying.append(input, i, j)
        i = j
      }
      else if (i + 1 >= n) { textStart.append(c); i += 1 }
      else {
        val c1 = input.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (input.startsWith("<!--", i)) {
            val end = input.indexOf("-->", i + 4)
            val content = if (end < 0) input.substring(i + 4) else input.substring(i + 4, end)
            budget()
            val cm = new DomNode(NodeType.Comment, "#comment")
            cm.value = content
            // comments outside any open element attach to the body (the
            // only placement the tests observe); inside one, in place.
            if (!inBody && stack.isEmpty) bodyEl.appendChild(cm)
            else currentParent.appendChild(cm)
            i = if (end < 0) n else end + 3
          } else {
            // doctype / CDATA / bogus declaration: consume to '>'
            val end = input.indexOf('>', i + 2)
            val content = if (end < 0) input.substring(i + 2) else input.substring(i + 2, end)
            if (content.take(7).equalsIgnoreCase("doctype") && !sawDoctype) {
              val dt = new DomNode(NodeType.DocumentType, "!doctype")
              dt.value = content.drop(7).trim match { case "" => "html"; case s => s }
              doc.appendChild(dt)
              sawDoctype = true
            }
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') {
          flushText()
          val end = input.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          // end tag
          val close = tagNameEnd(input, i + 2)
          if (close == i + 2) { textStart.append(c); i += 1 }
          else {
            val name = TagNames.lookup(input, i + 2, close)
            flushText()
            val end = input.indexOf('>', close)
            i = if (end < 0) n else end + 1
            handleEndTag(name)
          }
        } else if (Character.isLetter(c1)) {
          val afterName = tagNameEnd(input, i + 1)
          val name = TagNames.lookup(input, i + 1, afterName)
          flushText()
          val (attrs, selfClosing, afterTag) = readAttrs(input, afterName)
          i = afterTag
          handleStartTag(name, attrs, selfClosing) match {
            case Some(rawEl) =>
              // raw-text / RCDATA: consume until matching end tag
              // (ASCII-case-insensitive scan; avoids lowercasing a copy of
              // the whole input, which both costs a full-document
              // allocation and can shift offsets for locale-sensitive
              // uppercase code points like U+0130)
              val endTag = "</" + rawEl.tag
              val j = indexOfAsciiIgnoreCase(input, endTag, i)
              val contentEnd = if (j < 0) n else j
              var raw = input.substring(i, contentEnd)
              // HTML5: drop the single newline right after <textarea>
              if (rawEl.tag == "textarea") {
                if (raw.startsWith("\r\n")) raw = raw.substring(2)
                else if (raw.startsWith("\n") || raw.startsWith("\r")) raw = raw.substring(1)
              }
              if (raw.nonEmpty) {
                budget()
                val t = new DomNode(NodeType.Text, "#text")
                t.value = if (RcData.contains(rawEl.tag)) Entities.decode(raw) else raw
                rawEl.appendChild(t)
              }
              if (j < 0) i = n
              else {
                val gt = input.indexOf('>', j)
                i = if (gt < 0) n else gt + 1
              }
              // pop the raw element
              if (stack.nonEmpty && (stack.last eq rawEl)) stack.remove(stack.size - 1)
            case None =>
          }
        } else { textStart.append(c); i += 1 }
      }
    }
    flushText()

    def handleStartTag(name0: String, attrs: Seq[(String, String)],
        selfClosing: Boolean): Option[DomNode] = {
      val name = name0.toLowerCase
      name match {
        case "html" =>
          attrs.foreach { case (k, v) => if (!htmlEl.attrs.contains(k)) htmlEl.attrs(k) = v }
          return None
        case "head" => return None
        case "body" =>
          attrs.foreach { case (k, v) => if (!bodyEl.attrs.contains(k)) bodyEl.attrs(k) = v }
          switchToBody()
          return None
        case _ =>
      }
      // head content stays in head until body content appears; foreign
      // (svg) subtrees keep their title etc. in place
      val inForeign = stack.exists(e => e.tag == "svg" || e.tag == "math")
      if (!inBody && stack.isEmpty && !HeadContent.contains(name)) switchToBody()

      // implicit closes
      if (ClosesP.contains(name)) {
        val pIdx = stack.lastIndexWhere(_.tag == "p")
        if (pIdx >= 0 && !stack.drop(pIdx + 1).exists(e => ClosesP.contains(e.tag)))
          stack.remove(pIdx, stack.size - pIdx)
      }
      ImplicitClose.get(name).foreach { closes =>
        while (stack.nonEmpty && closes.contains(stack.last.tag))
          stack.remove(stack.size - 1)
      }

      budget()
      val el = new DomNode(NodeType.Element, name)
      attrs.foreach { case (k, v) => if (!el.attrs.contains(k)) el.attrs(k) = v }
      currentParent.appendChild(el)
      val isVoid = Serializer.VoidElements.contains(name)
      if (!isVoid && !selfClosing) {
        if (stack.size < MaxDepth) stack += el
        // beyond MaxDepth: element stays in the tree but children attach
        // flat at the cap (tolerant, bounded)
        if (!inForeign && RawText.contains(name)) return Some(el)
        if (!inForeign && RcData.contains(name)) return Some(el)
      }
      None
    }

    def handleEndTag(name0: String): Unit = {
      val name = name0.toLowerCase
      name match {
        case "html" => return
        case "head" => return // head closes implicitly
        case "body" => switchToBody(); stack.clear(); return
        case _ =>
      }
      val idx = stack.lastIndexWhere(_.tag == name)
      if (idx >= 0) stack.remove(idx, stack.size - idx)
      // unmatched end tags are ignored (tolerant)
    }

    // assemble structure: doctype (already on doc) then html(head, body)
    doc.appendChild(htmlEl)
    htmlEl.appendChild(headEl)
    htmlEl.appendChild(bodyEl)
    doc
  }

  /** Find `target` (lowercase ASCII) in `s` from `from`, matching ASCII
    * letters case-insensitively. Offsets stay valid for `s` itself.
    */
  private[html] def indexOfAsciiIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length
    val m = target.length
    if (m == 0) return from
    val t0 = target.charAt(0)
    var i = math.max(from, 0)
    val last = n - m
    while (i <= last) {
      var c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c == t0) {
        var k = 1
        var ok = true
        while (ok && k < m) {
          var ck = s.charAt(i + k)
          if (ck >= 'A' && ck <= 'Z') ck = (ck + 32).toChar
          if (ck != target.charAt(k)) ok = false else k += 1
        }
        if (ok) return i
      }
      i += 1
    }
    -1
  }

  private[html] def readTagName(s: String, from: Int): (String, Int) = {
    val i = tagNameEnd(s, from)
    (TagNames.lookup(s, from, i), i)
  }

  /** End index of a tag name starting at `from` (the scan half of
    * [[readTagName]], allocation-free so tokenizers can pair it with
    * [[TagNames.lookup]]).
    */
  private[html] def tagNameEnd(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '-' ||
           s.charAt(i) == '_' || s.charAt(i) == ':')) i += 1
    i
  }

  /** Scan past a tag's attributes without materializing them — same
    * control flow as [[readAttrs]] (quoted values may contain '>'), no
    * allocations. Returns (selfClosing, index after '>'). The streaming
    * extractor uses this for every tag whose attributes the active
    * option set can never read — the per-tag attr vector + lowercase
    * names + entity-decoded values were the top allocation source on
    * the extraction hot path.
    */
  private[html] def skipAttrs(s: String, from: Int): (Boolean, Int) = {
    var i = from
    val n = s.length
    var selfClosing = false
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/') {
        if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 1 }
        else i += 1
      } else {
        while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '=' &&
               s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        while (i < n && s.charAt(i).isWhitespace) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && s.charAt(i).isWhitespace) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            while (i < n && s.charAt(i) != q) i += 1
            if (i < n) i += 1
          } else {
            while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
          }
        }
      }
    }
    (selfClosing, if (i < n) i + 1 else n)
  }

  /** Parse attributes until '>' (or EOF). Returns (attrs, selfClosing,
    * index after '>').
    */
  private[html] def readAttrs(s: String, from: Int): (Seq[(String, String)], Boolean, Int) = {
    val attrs = mutable.ArrayBuffer.empty[(String, String)]
    var i = from
    val n = s.length
    var selfClosing = false
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/') {
        if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 1 }
        else i += 1
      } else {
        // attribute name
        val nameStart = i
        while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '=' &&
               s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val name = s.substring(nameStart, i).toLowerCase
        // skip ws
        while (i < n && s.charAt(i).isWhitespace) i += 1
        var value = ""
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && s.charAt(i).isWhitespace) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            val vs = i
            while (i < n && s.charAt(i) != q) i += 1
            value = s.substring(vs, math.min(i, n))
            if (i < n) i += 1
          } else {
            val vs = i
            while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
            value = s.substring(vs, i)
          }
          value = Entities.decode(value)
        }
        if (name.nonEmpty) attrs += (name -> value)
      }
    }
    (attrs.toSeq, selfClosing, if (i < n) i + 1 else n)
  }
}
