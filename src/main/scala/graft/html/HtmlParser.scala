package graft.html

import scala.collection.mutable

/** Tolerant HTML5-ish tokenizer + tree builder.
  *
  * Scope: the behaviors the reference's own tests pin
  * (tests/resiliparse/parse/test_html.py:60-115 quirks, structure
  * enforcement, RCDATA/raw-text elements) plus the three WHATWG
  * tree-construction rule families that most change real crawl pages
  * (the reference backend is the spec-complete lexbor,
  * resiliparse/src/parse/html/tree.rs:63-89):
  *  - the ADOPTION AGENCY algorithm with an active-formatting-elements
  *    list (reconstruction, Noah's Ark clause, scope markers on
  *    td/th/caption/template/applet/object/marquee), so misnested
  *    formatting tags (`<b><i></b></i>`, `<b>1<div>2</b>3</div>`)
  *    produce the browser tree;
  *  - FOSTER PARENTING: character and element tokens that are invalid
  *    directly inside table/tbody/thead/tfoot/tr are re-inserted
  *    immediately before the nearest open table (whitespace-only text
  *    stays in place); a nested `<table>` closes the open table first;
  *  - `<template>` CONTENT: template subtrees parse normally (table
  *    fragments inside them are NOT fostered out) and push a formatting
  *    scope marker; text extraction skips them (matching the reference,
  *    whose template content lives in a separate fragment).
  *
  * Scope/synthesis rules implemented per spec (r10): implicit table
  * sections (`<table><tr>` → table > tbody > tr; td/th synthesize the
  * missing tbody/tr; col synthesizes colgroup), BUTTON scope for every
  * p-closing rule (start tags and `</p>`), the dedicated li/dd/dt stack
  * walk (stop at special-but-not-address/div/p, then close p in button
  * scope), TABLE scope for table-family end tags (barriers table/
  * template), LIST ITEM scope for `</li>`, the named in-scope end-tag
  * clauses for the block/container groups ([[ScopedEndTags]]), the
  * any-heading `</hN>` rule, `</br>` acting as a br start tag, and the
  * "any other end tag" rule (the first special element that isn't the
  * target IGNORES the token, as browsers do).
  *
  * Template content semantics (deviations list CLOSED, r11): template
  * subtrees are fragment-scoped in every OBSERVABLE behavior —
  * document-order traversal (`iterateSubtree`), `query_selector(_all)`,
  * `get_elements_by_*`, `Element.text` and text extraction all stop at
  * the template boundary ([[DomTraversal.preOrderDocument]]), matching
  * the reference's lexbor backend where content lives in a separate
  * fragment (resiliparse/src/parse/html/tree.rs:63-89); serialization
  * round-trips the content exactly like browser innerHTML. The content
  * is PHYSICALLY attached as the template's children (`childNodes` is
  * this engine's `.content` access path) — a representation choice
  * invisible to the reference API surface, not a semantic deviation.
  * Template subtrees keep the generic insertion mode, so table
  * fragments inside them don't synthesize sections (per the spec's
  * "in template" mode following the fragment rules).
  *
  * Stray table-structure tags outside any table (and outside template
  * content) are IGNORED per the in-body mode — `<td>x` in body keeps x
  * and drops the td, as browsers do (r10; previously kept as soup).
  *
  * Standing guarantees (unchanged):
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
/** Interned lowercase ATTRIBUTE names (same open-addressing scheme as
  * [[TagNames]]): attr parsing allocated a `substring`+`toLowerCase`
  * pair per attribute, and the vocabulary of real-world attribute names
  * is concentrated in a few dozen entries. Unknown names fall back to
  * allocating.
  *
  * Deliberately NOT unified with [[TagNames]] / [[Entities]]' table:
  * the three probe loops run on the tokenizer's per-tag/per-attr/
  * per-entity hot path and differ in semantics (case-folding identity
  * intern here and in TagNames; case-SENSITIVE name->replacement
  * mapping in Entities) — a shared helper parameterized over folding
  * and value lookup would put a megamorphic call in each loop for ~30
  * saved lines apiece.
  */
private[html] object AttrNames {
  private val Size = 256
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
  Seq(
    "class", "id", "style", "href", "src", "alt", "title", "rel", "type",
    "name", "value", "content", "target", "role", "width", "height", "lang",
    "dir", "placeholder", "itemprop", "itemtype", "itemscope", "aria-hidden",
    "aria-expanded", "aria-label", "aria-labelledby", "aria-describedby",
    "aria-controls", "aria-haspopup", "aria-current", "data-src", "data-id",
    "loading", "srcset", "sizes", "media", "integrity", "crossorigin",
    "async", "defer", "disabled", "checked", "selected", "multiple",
    "readonly", "required", "size", "maxlength", "min", "max", "step",
    "pattern", "autocomplete", "tabindex", "accesskey", "download",
    "hreflang", "ping", "referrerpolicy", "shape", "coords", "usemap",
    "ismap", "frameborder", "scrolling", "allow", "allowfullscreen",
    "controls", "autoplay", "loop", "muted", "poster", "preload", "span",
    "headers", "scope", "abbr", "start", "reversed", "datetime", "cite",
    "open", "hidden", "draggable", "contenteditable", "spellcheck",
    "translate", "xmlns", "xml:lang", "version", "encoding", "property",
    "http-equiv", "charset", "action", "method", "for", "label", "colspan",
    "rowspan", "align", "valign", "border", "cellpadding", "cellspacing",
    "bgcolor", "color", "face", "onclick", "onload", "onerror").foreach { t =>
    var slot = hashRegion(t, 0, t.length) & (Size - 1)
    while (table(slot) != null) slot = (slot + 1) & (Size - 1)
    table(slot) = t
  }
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
  /** Raw-text elements (contents never tokenized as markup, no entity
    * decoding). Per spec this includes iframe and noembed; plaintext is
    * the degenerate case whose "contents" run to EOF (no end tag exists).
    */
  private[html] val RawText = Set("script", "style", "xmp", "noframes",
    "iframe", "noembed", "plaintext")
  private[html] val RcData = Set("title", "textarea")

  /** Elements whose start tag implicitly closes an open <p> (the spec's
    * close-a-p-element groups in the in-body insertion mode).
    */
  private[html] val ClosesP = Set("address", "article", "aside", "blockquote",
    "center", "details", "dialog", "dir", "div", "dl", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hgroup", "hr", "listing", "main", "menu", "nav", "ol", "p", "plaintext",
    "pre", "search", "section", "summary", "table", "ul", "xmp")

  /** tag -> set of open tags its start implicitly closes (nearest first).
    * li/dd/dt are NOT here: they use the spec's dedicated stack walk
    * (stop at special-but-not-address/div/p, then close an open p in
    * button scope) in both tree paths.
    */
  private[html] val ImplicitClose: Map[String, Set[String]] = Map(
    "tr" -> Set("tr", "td", "th"), "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "option" -> Set("option"), "optgroup" -> Set("option", "optgroup"),
    "thead" -> Set("tr", "td", "th"), "tbody" -> Set("tr", "td", "th", "thead"),
    "tfoot" -> Set("tr", "td", "th", "tbody"))

  /** Null-returning view of [[ImplicitClose]] for the per-start-tag hot
    * path: `Map.get(..).foreach{..}` there allocated a Some plus a
    * capturing closure on EVERY tag (2.5 GB over a w19-sized profile).
    */
  private[html] val ImplicitCloseJ: java.util.HashMap[String, Set[String]] = {
    val m = new java.util.HashMap[String, Set[String]]()
    ImplicitClose.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** The WHATWG generic "has an element in scope" barrier set:
    * applet/caption/table/td/th/marquee/object/template. html/head/body
    * never sit on the below-body stack, so the stack bottom is the
    * implicit html barrier. Scope VARIANTS extend this set: BUTTON
    * scope adds button (p-closing rules), LIST ITEM scope adds ol/ul
    * (`</li>`), TABLE scope replaces it with table/template. (SVG/
    * MathML integration-point barriers are subsumed by the foreign-
    * content handling: reconstruction/scope rules don't run in foreign
    * subtrees here.)
    */
  private[html] val ScopeBarriers = Set("applet", "caption", "table",
    "td", "th", "marquee", "object", "template")

  /** End tags resolved by the spec's NAMED in-body clauses: "if the
    * stack has an element in scope with the same tag name, generate
    * implied end tags and pop until it has been popped; otherwise
    * ignore the token". The block/container groups all share this
    * shape (the applet/marquee/object clause additionally clears the
    * formatting list to its marker — popRange does that via MarkerF).
    * End tags NOT here — and not formatting / table-family / heading /
    * p / li / dd / dt, which have their own variants — take the
    * "any other end tag" walk that stops at special elements.
    */
  private[html] val ScopedEndTags = Set("address", "article", "aside",
    "blockquote", "button", "center", "details", "dialog", "dir", "div",
    "dl", "fieldset", "figcaption", "figure", "footer", "header", "hgroup",
    "listing", "main", "menu", "nav", "ol", "pre", "search", "section",
    "summary", "ul", "applet", "marquee", "object", "select",
    "textarea")

  /** Tags the spec's "generate implied end tags" step closes. */
  private[html] val ImpliedEndTags = Set("p", "li", "dd", "dt", "option",
    "optgroup", "rp", "rt")

  /** The WHATWG formatting-element category (in-body insertion rules):
    * these participate in the active-formatting list / adoption agency.
    */
  private[html] val FormattingTags = Set("a", "b", "big", "code", "em", "font",
    "i", "nobr", "s", "small", "strike", "strong", "tt", "u")

  /** Elements that push a scope MARKER onto the active formatting list
    * when opened and clear the list back to it when closed (spec: applet,
    * object, marquee, template, td, th, caption).
    */
  private[html] val MarkerTags = Set("td", "th", "caption", "template",
    "applet", "object", "marquee")

  /** The spec's "special" category (HTML namespace) — the furthest-block
    * candidates in the adoption agency algorithm.
    */
  private[html] val SpecialTags = Set("address", "applet", "area", "article",
    "aside", "base", "basefont", "bgsound", "blockquote", "body", "br", "button",
    "caption", "center", "col", "colgroup", "dd", "details", "dir", "div", "dl",
    "dt", "embed", "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup",
    "hr", "html", "iframe", "img", "input", "keygen", "li", "link", "listing",
    "main", "marquee", "menu", "meta", "nav", "noembed", "noframes", "noscript",
    "object", "ol", "p", "param", "plaintext", "pre", "script", "search",
    "section", "select", "source", "style", "summary", "table", "tbody", "td",
    "template", "textarea", "tfoot", "th", "thead", "title", "tr", "track",
    "ul", "wbr", "xmp")

  /** The elements whose direct children are table-structure-only: content
    * not in [[TableAllowed]] inserted here gets foster-parented.
    */
  private[html] val TableCtxTags = Set("table", "tbody", "thead", "tfoot", "tr")

  /** Tokens legal directly inside a table context (no fostering). The
    * td/th entries cover our no-implicit-tbody deviation; script/style/
    * template/form per the in-table insertion mode.
    */
  private[html] val TableAllowed = Set("caption", "colgroup", "col", "tbody",
    "tfoot", "thead", "tr", "td", "th", "script", "style", "template", "form")

  /** Table-structure start tags that first "clear the stack back to a
    * table context" when a table is open.
    */
  private[html] val TableStructureTags = Set("caption", "colgroup", "col",
    "tbody", "tfoot", "thead", "tr", "td", "th")

  /** The stack index table-structure tags clear back to: sections stop at
    * the table, rows at the nearest section, cells at the nearest row —
    * each falling back outward when the inner context is absent.
    * `ti`/`bi`/`ri` are the stack indices of the open table / last
    * tbody-thead-tfoot / last tr (-1 when absent).
    */
  private[html] def clearBackBase(name: String, ti: Int, bi: Int, ri: Int): Int =
    name match {
      case "td" | "th" =>
        if (ri > ti) ri else if (bi > ti) bi else ti
      case "tr" =>
        if (bi > ti) bi else ti
      case _ => ti
    }

  /** Start tags whose in-body insertion rules do NOT call "reconstruct the
    * active formatting elements" (block/structure/head/table tokens).
    * Everything else — text, phrasing content, formatting tags, br/img/
    * input/button/select/object... — reconstructs first.
    */
  private[html] val NoReconstructTags = Set("html", "head", "body", "frameset",
    "frame", "base", "basefont", "bgsound", "link", "meta", "noframes", "script",
    "style", "template", "title", "noscript", "address", "article", "aside",
    "blockquote", "center", "details", "dialog", "dir", "div", "dl", "fieldset",
    "figcaption", "figure", "footer", "header", "hgroup", "main", "menu", "nav",
    "ol", "p", "search", "section", "summary", "ul", "h1", "h2", "h3", "h4",
    "h5", "h6", "pre", "listing", "form", "li", "dd", "dt", "plaintext",
    "table", "hr", "textarea", "caption", "col", "colgroup", "tbody", "td",
    "tfoot", "th", "thead", "tr")

  /** Open-element depth cap (browsers clamp around 512): beyond it, new
    * elements attach flat at the cap instead of nesting deeper. Keeps
    * every recursive consumer (text, serialize, traversal, selectors)
    * within stack bounds — a 100k-deep <div> bomb must not kill a task
    * with a StackOverflowError (Error, so no catch saves it).
    */
  private[html] val MaxDepth = 512

  /** Per-tag category bitmask, one hash lookup per tag event (or per node
    * creation) instead of one immutable-Set probe per category test — the
    * tree builder consults up to ~8 categories per start tag and re-tests
    * stack entries on every scan. Built from the category Sets above, so
    * they remain the single source of truth.
    */
  private[html] object TagFlags {
    final val HeadContentF = 1
    final val RawTextF = 1 << 1
    final val RcDataF = 1 << 2
    final val ClosesPF = 1 << 3
    final val FormattingF = 1 << 4
    final val MarkerF = 1 << 5
    final val SpecialF = 1 << 6
    final val TableCtxF = 1 << 7
    final val TableAllowedF = 1 << 8
    final val TableStructureF = 1 << 9
    final val NoReconstructF = 1 << 10
    final val VoidF = 1 << 11
    final val ForeignRootF = 1 << 12 // svg | math
    final val BlockF = 1 << 13      // Html2Text.BlockElements
    final val BigBlockF = 1 << 14   // Html2Text.BigBlock
    final val ScopeBarrierF = 1 << 15 // ScopeBarriers (generic scope)

    // open-addressing flag table (String.hashCode is instance-cached and
    // known tags arrive as the interned literal, so a probe is an array
    // read + reference compare — the java.util.HashMap version paid
    // getNode + Integer unboxing once per ELEMENT via DomNode.flags)
    private val Size = 512
    private val keys = new Array[String](Size)
    private val vals = new Array[Int](Size)
    private def add(tags: Iterable[String], f: Int): Unit = tags.foreach { t =>
      var slot = t.hashCode & (Size - 1)
      while (keys(slot) != null && keys(slot) != t) slot = (slot + 1) & (Size - 1)
      keys(slot) = t
      vals(slot) |= f
    }
    add(HeadContent, HeadContentF)
    add(RawText, RawTextF)
    add(RcData, RcDataF)
    add(ClosesP, ClosesPF)
    add(FormattingTags, FormattingF)
    add(MarkerTags, MarkerF)
    add(SpecialTags, SpecialF)
    add(TableCtxTags, TableCtxF)
    add(TableAllowed, TableAllowedF)
    add(TableStructureTags, TableStructureF)
    add(NoReconstructTags, NoReconstructF)
    add(ScopeBarriers, ScopeBarrierF)
    add(Serializer.VoidElements, VoidF)
    add(Seq("svg", "math"), ForeignRootF)
    add(Html2Text.BlockElements, BlockF)
    add(Html2Text.BigBlock, BigBlockF)

    def apply(tag: String): Int = {
      var slot = tag.hashCode & (Size - 1)
      var probes = 0
      while (probes < Size) {
        val k = keys(slot)
        if (k == null) return 0
        if ((k eq tag) || k.equals(tag)) return vals(slot)
        slot = (slot + 1) & (Size - 1)
        probes += 1
      }
      0
    }
  }

  /** Allocation-free `lastIndexWhere(_.tag == tag)`: the stdlib default
    * builds a reversed view iterator per call, and these scans run per
    * tag event (the round-9 profile had the view allocation as the
    * parser's top frame). Null-safe for the formatting list's markers.
    */
  private def lastIndexTag(buf: mutable.ArrayBuffer[DomNode], tag: String): Int = {
    var k = buf.size - 1
    while (k >= 0) {
      val e = buf(k)
      if (e != null && e.tag == tag) return k
      k -= 1
    }
    -1
  }

  /** Allocation-free `lastIndexWhere(_ eq el)`. */
  private def lastIndexEq(buf: mutable.ArrayBuffer[DomNode], el: DomNode): Int = {
    var k = buf.size - 1
    while (k >= 0) {
      if (buf(k) eq el) return k
      k -= 1
    }
    -1
  }

  /** Parse with an optional DOM node budget (MemGuard analog,
    * process_guard.pyx:184-533): every created node — element, text,
    * comment, adoption-agency/reconstruction clone — counts against
    * `maxNodes`; exceeding it throws [[graft.core.MemGuardException]].
    * The DEPTH cap above bounds stack use; this bounds HEAP use: DOM
    * object overhead amplifies input ~30-100x, so a budget of N nodes
    * caps one record's tree at roughly N * 100 bytes regardless of input
    * size.
    */
  def parse(input: String, maxNodes: Int = Int.MaxValue): DomNode = {
    val doc = new DomNode(NodeType.Document, "#document")
    val htmlEl = new DomNode(NodeType.Element, "html")
    val headEl = new DomNode(NodeType.Element, "head")
    val bodyEl = new DomNode(NodeType.Element, "body")

    // reusable per-parse attribute buffer (see readAttrsInto)
    val attrBuf = mutable.ArrayBuffer.empty[(String, String)]

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
    // active formatting elements; null entries are scope markers
    val formatting = mutable.ArrayBuffer.empty[DomNode]

    def currentParent: DomNode =
      if (stack.nonEmpty) stack.last else if (inBody) bodyEl else headEl

    def clearStack(): Unit = {
      var k = 0
      while (k < stack.size) { stack(k).onStack = false; k += 1 }
      stack.clear()
    }

    def switchToBody(): Unit =
      if (!inBody) { clearStack(); formatting.clear(); inBody = true }

    /** Stack index of the nearest open `tag` within generic scope plus
      * up to two extra barrier tags (null = unused): the downward walk
      * stops at any barrier, so an element behind a table cell /
      * caption / object boundary is invisible outside it. Button scope
      * = extra "button"; list-item scope = extra "ol"/"ul".
      */
    def indexInScope(tag: String, extra1: String = null,
        extra2: String = null): Int = {
      var k = stack.size - 1
      while (k >= 0) {
        val e = stack(k)
        if (e.tag == tag) return k
        if ((e.flags & TagFlags.ScopeBarrierF) != 0 ||
            e.tag == extra1 || e.tag == extra2) return -1
        k -= 1
      }
      -1
    }

    /** "has a p element in BUTTON scope" — the variant every p-closing
      * rule uses.
      */
    def indexInButtonScope(tag: String): Int = indexInScope(tag, "button")

    /** Pop stack entries [idx, top] innermost-first: marker elements clear
      * the formatting list back to their marker; popped-through formatting
      * elements stay in the list (the residue that later reconstruction
      * re-opens, per spec).
      */
    def popRange(idx: Int): Unit = {
      var k = stack.size - 1
      while (k >= idx) {
        val e = stack.remove(k)
        e.onStack = false
        if ((e.flags & TagFlags.MarkerF) != 0) clearFormattingToMarker()
        k -= 1
      }
    }

    def clearFormattingToMarker(): Unit = {
      var done = false
      while (!done && formatting.nonEmpty) {
        val e = formatting.remove(formatting.size - 1)
        if (e == null) done = true
      }
    }

    def formattingContains(e: DomNode): Boolean = {
      var i = formatting.size - 1
      while (i >= 0) {
        if (formatting(i) eq e) return true
        i -= 1
      }
      false
    }

    /** Push onto the active formatting list with the Noah's Ark clause:
      * if three entries with the same tag and attributes exist after the
      * last marker, drop the earliest.
      */
    def pushFormatting(el: DomNode): Unit = {
      var count = 0
      var earliest = -1
      var i = formatting.size - 1
      var stop = false
      while (i >= 0 && !stop) {
        val e = formatting(i)
        if (e == null) stop = true
        else {
          if (e.tag == el.tag && sameAttrs(e, el)) { count += 1; earliest = i }
          i -= 1
        }
      }
      if (count >= 3 && earliest >= 0) formatting.remove(earliest)
      formatting += el
    }

    def sameAttrs(a: DomNode, b: DomNode): Boolean = {
      val aa = a.attrsOrNull
      val ba = b.attrsOrNull
      val an = if (aa == null) 0 else aa.size
      val bn = if (ba == null) 0 else ba.size
      if (an != bn) return false
      if (an == 0) return true
      aa.forall { case (k, v) => ba.get(k).contains(v) }
    }

    /** Whether `a` is `n` or one of n's ancestors (cycle guard for the
      * adoption agency's reparenting steps). The walk is bounded so a
      * latent cycle can never spin the guard itself.
      */
    def isAncestorOf(a: DomNode, n: DomNode): Boolean = {
      var p = n
      var steps = 0
      while (p != null && steps < 4 * MaxDepth) {
        if (p eq a) return true
        p = p.parent
        steps += 1
      }
      steps >= 4 * MaxDepth // over-deep/cyclic chain: refuse the reparent
    }

    def cloneShallow(src: DomNode): DomNode = {
      budget()
      val c = new DomNode(NodeType.Element, src.tag)
      val as = src.attrsOrNull
      if (as != null) as.foreach { case (k, v) => c.attrs(k) = v }
      c
    }

    /** Whether an insertion at the current point must be foster-parented:
      * parent is a table-context element, the token isn't table content,
      * a table is actually open, and no template is open inside it
      * (template content never fosters).
      */
    def fosterNeeded(parent: DomNode): Boolean = {
      if ((parent.flags & TagFlags.TableCtxF) == 0) return false
      val ti = lastIndexTag(stack, "table")
      if (ti < 0) return false
      var j = ti + 1
      while (j < stack.size) {
        if (stack(j).tag == "template") return false
        j += 1
      }
      true
    }

    /** Insert `node` immediately before the nearest open table (the
      * foster-parenting target). Caller has checked [[fosterNeeded]].
      */
    def fosterInsert(node: DomNode): Unit = {
      val ti = lastIndexTag(stack, "table")
      val table = stack(ti)
      if (table.parent != null) table.parent.insertBefore(node, table)
      else if (ti > 0) stack(ti - 1).appendChild(node)
      else (if (inBody) bodyEl else headEl).appendChild(node)
    }

    /** Append an element at the insertion point, foster-parenting when the
      * point sits directly in table structure and the tag isn't table
      * content.
      */
    def insertElementNode(el: DomNode): Unit = {
      val parent = currentParent
      if ((el.flags & TagFlags.TableAllowedF) == 0 && fosterNeeded(parent)) fosterInsert(el)
      else parent.appendChild(el)
    }

    /** Reconstruct the active formatting elements (spec 13.2.4.3): clone
      * every post-marker entry no longer on the open stack, in list
      * order, re-opening them at the insertion point. No-op (O(1)) when
      * the list tail is in sync with the stack — the common case.
      */
    def reconstruct(): Unit = {
      if (formatting.isEmpty) return
      val lastE = formatting.last
      if (lastE == null || lastE.onStack) return
      var i = formatting.size - 1
      var stop = false
      while (i > 0 && !stop) {
        val prev = formatting(i - 1)
        if (prev == null || prev.onStack) stop = true else i -= 1
      }
      while (i < formatting.size) {
        val clone = cloneShallow(formatting(i))
        insertElementNode(clone)
        if (stack.size < MaxDepth) { stack += clone; clone.onStack = true }
        formatting(i) = clone
        i += 1
      }
    }

    /** The adoption agency algorithm (spec 13.2.6.4.7 "in body" end-tag
      * rules for formatting elements), identity-based over the small
      * stack/list so index bookkeeping survives mid-loop mutations.
      */
    def adoptionAgency(subject: String): Unit = {
      // spec fast path: current node is the subject and not in the list
      if (stack.nonEmpty && stack.last.tag == subject &&
          !formattingContains(stack.last)) {
        popRange(stack.size - 1)
        return
      }
      var outer = 0
      while (outer < 8) {
        outer += 1
        // the last formatting entry for `subject` after the last marker
        var fi = -1
        var i = formatting.size - 1
        var stop = false
        while (i >= 0 && !stop) {
          val e = formatting(i)
          if (e == null) stop = true
          else if (e.tag == subject) { fi = i; stop = true }
          else i -= 1
        }
        if (fi < 0) {
          // no entry: fall back to the generic (tolerant) end-tag pop
          val idx = lastIndexTag(stack, subject)
          if (idx >= 0) popRange(idx)
          return
        }
        val fmtEl = formatting(fi)
        if (!fmtEl.onStack) { formatting.remove(fi); return }
        val si = lastIndexEq(stack, fmtEl)
        // furthest block: the lowest special element above fmtEl
        var fb = -1
        var j = si + 1
        while (j < stack.size && fb < 0) {
          if ((stack(j).flags & TagFlags.SpecialF) != 0) fb = j else j += 1
        }
        if (fb < 0) {
          // no furthest block: pop through fmtEl (non-special elements
          // above stay in the list — residue that reconstruction re-opens)
          popRange(si)
          val fiNow = lastIndexEq(formatting, fmtEl)
          if (fiNow >= 0) formatting.remove(fiNow)
          return
        }
        val furthest = stack(fb)
        val commonAncestor =
          if (si > 0) stack(si - 1) else if (inBody) bodyEl else headEl
        var bookmark = fi
        var lastNode = furthest
        var ni = fb
        var innerCount = 0
        var innerDone = false
        while (!innerDone) {
          ni -= 1
          val nodeCur = stack(ni)
          if (nodeCur eq fmtEl) innerDone = true
          else {
            innerCount += 1
            var nodeFi = lastIndexEq(formatting, nodeCur)
            if (innerCount > 3 && nodeFi >= 0) {
              formatting.remove(nodeFi)
              if (nodeFi < bookmark) bookmark -= 1
              nodeFi = -1
            }
            if (nodeFi < 0) {
              stack.remove(ni)
              nodeCur.onStack = false
              // the element formerly above nodeCur is now at ni - 1;
              // the loop's ni -= 1 lands on it
            } else {
              val clone = cloneShallow(nodeCur)
              formatting(nodeFi) = clone
              stack(ni) = clone
              nodeCur.onStack = false
              clone.onStack = true
              if (lastNode eq furthest) bookmark = nodeFi + 1
              clone.appendChild(lastNode) // appendChild detaches first
              lastNode = clone
            }
          }
        }
        // place lastNode under the common ancestor (foster-aware). The
        // spec algorithm assumes stack order mirrors tree ancestry, but
        // foster parenting breaks that invariant in a tolerant parser —
        // if the ACTUAL insertion target sits inside lastNode's subtree,
        // the reparent would make a node its own ancestor (a cycle that
        // turns every traversal into an infinite loop; found by the
        // differential fuzzer). Compute the real target (the foster
        // point when the ancestor is table structure) and guard THAT;
        // on a would-be cycle, reattach lastNode at the body instead so
        // the clone chain is never silently dropped from the document.
        val (tgt, ref): (DomNode, DomNode) =
          if (fosterNeeded(commonAncestor)) {
            val ti = lastIndexTag(stack, "table")
            val table = stack(ti)
            if (table.parent != null) (table.parent, table)
            else if (ti > 0) (stack(ti - 1), null)
            else (if (inBody) bodyEl else headEl, null)
          } else (commonAncestor, null)
        if (ref eq lastNode) {
          // the furthest block IS the foster table: it already sits at
          // its own insertion point — inserting a node before itself
          // would self-loop the sibling list
        } else if (!isAncestorOf(lastNode, tgt)) {
          if (ref != null) tgt.insertBefore(lastNode, ref)
          else tgt.appendChild(lastNode)
        } else if (!isAncestorOf(lastNode, if (inBody) bodyEl else headEl)) {
          (if (inBody) bodyEl else headEl).appendChild(lastNode)
        }
        // move the furthest block's children into a clone of fmtEl
        val fclone = cloneShallow(fmtEl)
        var ch = furthest.firstChild
        while (ch != null) {
          val nx = ch.next
          fclone.appendChild(ch)
          ch = nx
        }
        furthest.appendChild(fclone)
        // list: replace fmtEl's entry with the clone at the bookmark
        val fiNow = lastIndexEq(formatting, fmtEl)
        formatting.remove(fiNow)
        if (fiNow < bookmark) bookmark -= 1
        if (bookmark > formatting.size) bookmark = formatting.size
        formatting.insert(bookmark, fclone)
        // stack: remove fmtEl, re-open the clone just above the block
        val siNow = lastIndexEq(stack, fmtEl)
        stack.remove(siNow)
        fmtEl.onStack = false
        val fbNow = lastIndexEq(stack, furthest)
        stack.insert(fbNow + 1, fclone)
        fclone.onStack = true
      }
    }

    def insertText(raw0: String, decodeEntities: Boolean): Unit = {
      var raw = raw0
      if (raw.isEmpty) return
      // text before any body content: whitespace stays out of head/body
      // (dropped, matching inter-element whitespace handling); non-ws
      // text forces the body open.
      if (!inBody && stack.isEmpty) {
        if (allWs(raw)) return
        switchToBody()
      }
      val preParent = currentParent
      // HTML5: a single newline immediately after a pre/textarea/listing
      // start tag is dropped
      if (preParent.firstChild == null &&
          (preParent.tag == "pre" || preParent.tag == "textarea" || preParent.tag == "listing")) {
        if (raw.startsWith("\r\n")) raw = raw.substring(2)
        else if (raw.startsWith("\n") || raw.startsWith("\r")) raw = raw.substring(1)
        if (raw.isEmpty) return
      }
      reconstruct()
      budget()
      val t = new DomNode(NodeType.Text, "#text")
      t.value = if (decodeEntities) Entities.decode(raw) else raw
      val parent = currentParent
      // whitespace-only runs stay inside table structure; anything else
      // is foster-parented before the table (in-table character rules)
      if (fosterNeeded(parent) && !allWs(raw)) fosterInsert(t)
      else parent.appendChild(t)
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

    var pollCtr = 0
    while (i < n) {
      // cooperative guard cancellation, amortized (MemGuard.poll is a
      // native interrupt-flag read — not free per token)
      pollCtr += 1
      if ((pollCtr & 0xFF) == 0) graft.core.MemGuard.poll()
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
        } else if ((c1 < 128 && ((c1 | 0x20) >= 'a' && (c1 | 0x20) <= 'z')) ||
            (c1 >= 128 && Character.isLetter(c1))) {
          val afterName = tagNameEnd(input, i + 1)
          val name = TagNames.lookup(input, i + 1, afterName)
          flushText()
          // one buffer per parse: handleStartTag copies attrs into the
          // element (copyAttrs) before returning, never retains them
          attrBuf.clear()
          val packedAttrs = readAttrsInto(input, afterName, attrBuf)
          val selfClosing = (packedAttrs & 1L) != 0
          i = (packedAttrs >>> 1).toInt
          handleStartTag(name, attrBuf, selfClosing) match {
            case Some(rawEl) =>
              // raw-text / RCDATA: consume until matching end tag
              // (ASCII-case-insensitive scan; avoids lowercasing a copy of
              // the whole input, which both costs a full-document
              // allocation and can shift offsets for locale-sensitive
              // uppercase code points like U+0130)
              // plaintext has no end tag: everything to EOF is literal
              val j = if (rawEl.tag == "plaintext") -1
                else indexOfAsciiIgnoreCase(input, "</" + rawEl.tag, i)
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
                t.value = if ((rawEl.flags & TagFlags.RcDataF) != 0) Entities.decode(raw) else raw
                rawEl.appendChild(t)
              }
              if (j < 0) i = n
              else {
                val gt = input.indexOf('>', j)
                i = if (gt < 0) n else gt + 1
              }
              // pop the raw element
              if (stack.nonEmpty && (stack.last eq rawEl)) popRange(stack.size - 1)
            case None =>
          }
        } else { textStart.append(c); i += 1 }
      }
    }
    flushText()

    def handleStartTag(name0: String, attrs: mutable.ArrayBuffer[(String, String)],
        selfClosing: Boolean): Option[DomNode] = {
      val name = lowerFast(name0)
      name match {
        case "html" =>
          copyAttrs(attrs, htmlEl)
          return None
        case "head" => return None
        case "body" =>
          copyAttrs(attrs, bodyEl)
          switchToBody()
          return None
        case _ =>
      }
      // head content stays in head until body content appears; foreign
      // (svg) subtrees keep their title etc. in place
      val fl = TagFlags(name)
      val inForeign = {
        var k = stack.size - 1
        var f = false
        while (k >= 0 && !f) {
          f = (stack(k).flags & TagFlags.ForeignRootF) != 0
          k -= 1
        }
        f
      }
      if (!inBody && stack.isEmpty && (fl & TagFlags.HeadContentF) == 0) switchToBody()

      // a nested <table> closes the open table first ("in table" <table>)
      if (name == "table" && (currentParent.flags & TagFlags.TableCtxF) != 0) {
        val ti = lastIndexTag(stack, "table")
        if (ti >= 0) popRange(ti)
      }

      // stray table-structure tags with NO open table (and no template —
      // template content legitimately holds table fragments) are
      // IGNORED, like the spec's in-body mode: `<td>x` in body keeps x
      // and drops the td. The walk stops at table/template so a
      // template boundary keeps its own context.
      if ((fl & TagFlags.TableStructureF) != 0 && !inForeign) {
        var k = stack.size - 1
        while (k >= 0 && stack(k).tag != "table" && stack(k).tag != "template") k -= 1
        if (k < 0) return None
      }

      // "clear the stack back to a table (row) context": table-structure
      // tags pop anything fostered/misnested above the open table — e.g.
      // <table><b>x<tr> must not nest the row inside the fostered <b>.
      // Template subtrees are their own context (no clearing through).
      if ((fl & TagFlags.TableStructureF) != 0) {
        val ti = {
          var k = stack.size - 1
          while (k >= 0 && stack(k).tag != "table" && stack(k).tag != "template") k -= 1
          k
        }
        if (ti >= 0 && stack(ti).tag == "table") {
          val bi = {
            var k = stack.size - 1
            while (k >= 0 && stack(k).tag != "tbody" && stack(k).tag != "thead" &&
              stack(k).tag != "tfoot") k -= 1
            k
          }
          // a <col> with the colgroup still open at the top is in the
          // "in column group" insertion mode: it joins that colgroup
          // (no clear-back, no new synthesis)
          val base =
            if (name == "col" && stack.last.tag == "colgroup") stack.size - 1
            else clearBackBase(name, ti, bi, lastIndexTag(stack, "tr"))
          if (base + 1 < stack.size) popRange(base + 1)
          // implicit section synthesis (the in-table insertion modes):
          // <tr> directly in a table opens a tbody first; <td>/<th> open
          // the missing tbody and/or tr; <col> opens a colgroup — so
          // `<table><tr>` parses as table > tbody > tr, the lexbor/
          // browser tree (resiliparse/src/parse/html/tree.rs:63-89).
          def synth(tag: String): Unit = {
            budget()
            val el = new DomNode(NodeType.Element, tag)
            insertElementNode(el)
            if (stack.size < MaxDepth) { stack += el; el.onStack = true }
          }
          val top = stack.last.tag
          name match {
            case "tr" => if (top == "table") synth("tbody")
            case "td" | "th" =>
              if (top == "table") { synth("tbody"); synth("tr") }
              else if (top == "tbody" || top == "thead" || top == "tfoot") synth("tr")
            case "col" => if (top == "table") synth("colgroup")
            case _ =>
          }
        }
      }

      // <a>/<nobr> with a same-tag entry still active: implied end tag via
      // the adoption agency before opening the new one
      if ((name == "a" || name == "nobr") && !inForeign) {
        var k = formatting.size - 1
        var active = false
        while (k >= 0 && formatting(k) != null && !active) {
          if (formatting(k).tag == name) active = true else k -= 1
        }
        if (active) adoptionAgency(name)
      }

      // implicit closes: p-closing start tags use BUTTON scope (the
      // spec's "has a p element in button scope" — a p behind a button/
      // cell/caption barrier stays open)
      if ((fl & TagFlags.ClosesPF) != 0) {
        val pIdx = indexInButtonScope("p")
        if (pIdx >= 0) popRange(pIdx)
      }
      // li / dd / dt (spec in-body rules): walk the stack down — a
      // matching open item closes, popping everything above it; the walk
      // stops at any special element other than address/div/p (so a list
      // item inside a nested <div> still closes, but one behind a table
      // cell / button does not). Afterwards an open <p> in button scope
      // closes too (these three are not in the ClosesP group).
      if ((name == "li" || name == "dd" || name == "dt") && !inForeign) {
        val isLi = name == "li"
        var k = stack.size - 1
        var done = false
        while (k >= 0 && !done) {
          val t = stack(k).tag
          val hit = if (isLi) t == "li" else t == "dd" || t == "dt"
          if (hit) { popRange(k); done = true }
          else if ((stack(k).flags & TagFlags.SpecialF) != 0 &&
                   t != "address" && t != "div" && t != "p") done = true
          else k -= 1
        }
        val pIdx = indexInButtonScope("p")
        if (pIdx >= 0) popRange(pIdx)
      }
      val implicitCloses = ImplicitCloseJ.get(name)
      if (implicitCloses != null) {
        while (stack.nonEmpty && implicitCloses.contains(stack.last.tag))
          popRange(stack.size - 1)
      }

      if ((fl & TagFlags.NoReconstructF) == 0) reconstruct()

      budget()
      val el = new DomNode(NodeType.Element, name)
      copyAttrs(attrs, el)
      insertElementNode(el)
      val isVoid = (fl & TagFlags.VoidF) != 0
      // the self-closing slash is honored only on void and FOREIGN
      // elements (spec: on HTML elements it is a parse error and
      // ignored — browsers keep `<div/>` open)
      if (!isVoid && !(selfClosing && inForeign)) {
        if (stack.size < MaxDepth) {
          stack += el
          el.onStack = true
          if ((fl & TagFlags.FormattingF) != 0) pushFormatting(el)
          else if ((fl & TagFlags.MarkerF) != 0) formatting += null
        }
        // beyond MaxDepth: element stays in the tree but children attach
        // flat at the cap (tolerant, bounded)
        if (!inForeign && (fl & (TagFlags.RawTextF | TagFlags.RcDataF)) != 0)
          return Some(el)
      }
      None
    }

    def handleEndTag(name0: String): Unit = {
      val name = lowerFast(name0)
      name match {
        case "html" => return
        case "head" => return // head closes implicitly
        case "body" =>
          switchToBody(); clearStack(); formatting.clear(); return
        case _ =>
      }
      val fl = TagFlags(name)
      if ((fl & TagFlags.FormattingF) != 0) { adoptionAgency(name); return }
      // spec `</br>`: acts as a <br> START tag (browsers insert the
      // element); there is never an open br to close (void)
      if (name == "br") {
        handleStartTag("br", mutable.ArrayBuffer.empty, selfClosing = false)
        return
      }
      val idx =
        if ((fl & TagFlags.TableStructureF) != 0 || name == "table") {
          // table-family end tags resolve in TABLE scope (barriers:
          // table / template): `</td>` inside a nested table must not
          // pop out of it, and `</table>` inside a template must not
          // close a table outside.
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val t = stack(k).tag
            if (t == name) found = k
            else if (t == "table" || t == "template") k = -1
            else k -= 1
          }
          found
        } else if (name == "form") {
          // spec `</form>` (no form pointer/template modeling needed for
          // the tolerant scope): the form element is REMOVED from the
          // stack wherever it sits — elements ABOVE it stay open, so
          // `<form><div>x</form>more` keeps `more` inside the div like
          // browsers. Implied end tags at the top pop first.
          val fi = indexInScope("form")
          if (fi >= 0) {
            while (stack.size - 1 > fi &&
                (stack.last.flags & TagFlags.MarkerF) == 0 &&
                ImpliedEndTags.contains(stack.last.tag))
              popRange(stack.size - 1)
            val e = stack.remove(fi)
            e.onStack = false
          }
          -1 // removal handled here; nothing to popRange
        } else if (name == "p") {
          // dedicated `</p>` rule: close the p in BUTTON scope (popping
          // through non-barrier specials like div); with no p in scope
          // the spec inserts an EMPTY p element and closes it — do that
          // (in body, outside table structure where it would foster)
          val pi = indexInButtonScope("p")
          if (pi < 0 && inBody && !fosterNeeded(currentParent)) {
            budget()
            insertElementNode(new DomNode(NodeType.Element, "p"))
          }
          pi
        } else if (name == "li") {
          // LIST ITEM scope (generic barriers + ol/ul)
          indexInScope("li", "ol", "ul")
        } else if (name == "dd" || name == "dt" ||
            ScopedEndTags.contains(name)) {
          // named clause: element in generic scope closes (popping
          // implied-end/non-special content above it), else ignored
          indexInScope(name)
        } else if (name.length == 2 && name.charAt(0) == 'h' &&
            name.charAt(1) >= '1' && name.charAt(1) <= '6') {
          // `</hN>` closes the nearest open heading of ANY rank in scope
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val e = stack(k)
            val t = e.tag
            val isHeading = t.length == 2 && t.charAt(0) == 'h' &&
              t.charAt(1) >= '1' && t.charAt(1) <= '6'
            if (isHeading) found = k
            else if ((e.flags & TagFlags.ScopeBarrierF) != 0) k = -1
            else k -= 1
          }
          found
        } else {
          // the spec's "any other end tag" rule: walk down; a matching
          // node pops (with everything above it — subsumes the implied
          // end tags), but the first SPECIAL element that isn't the
          // target IGNORES the token, like browsers — `<span><div>
          // </span>` must not destroy the div's subtree placement
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val e = stack(k)
            if (e.tag == name) found = k
            else if ((e.flags & TagFlags.SpecialF) != 0) k = -1
            else k -= 1
          }
          found
        }
      if (idx >= 0) popRange(idx)
      // unmatched / out-of-scope end tags are ignored (spec + tolerant)
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
    val last = n - m
    // caseless first char (every real caller's target starts with '<'):
    // hop between candidates with the vectorized String.indexOf instead
    // of folding every character of a multi-KB raw-text body
    if (!((t0 >= 'a' && t0 <= 'z') || (t0 >= 'A' && t0 <= 'Z'))) {
      var i = math.max(from, 0)
      while (i <= last) {
        i = s.indexOf(t0, i)
        if (i < 0 || i > last) return -1
        var k = 1
        var ok = true
        while (ok && k < m) {
          var ck = s.charAt(i + k)
          if (ck >= 'A' && ck <= 'Z') ck = (ck + 32).toChar
          if (ck != target.charAt(k)) ok = false else k += 1
        }
        if (ok) return i
        i += 1
      }
      return -1
    }
    var i = math.max(from, 0)
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

  /** End index of a tag name starting at `from` — allocation-free so
    * tokenizers can pair it with [[TagNames.lookup]].
    */
  private[html] def tagNameEnd(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && isNameChar(s.charAt(i))) i += 1
    i
  }

  /** Tag-name character test with an ASCII fast path — bit-identical to
    * `Character.isLetterOrDigit(c) || c == '-' || c == '_' || c == ':'`
    * (the properties-table lookup ran once per name char). */
  @inline private def isNameChar(c: Char): Boolean =
    if (c < 128)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
    else Character.isLetterOrDigit(c)

  /** Scan past a tag's attributes without materializing them — same
    * control flow as [[readAttrs]] (quoted values may contain '>'), no
    * allocations. Returns (selfClosing, index after '>'). The streaming
    * extractor uses this for every tag whose attributes the active
    * option set can never read — the per-tag attr vector + lowercase
    * names + entity-decoded values were the top allocation source on
    * the extraction hot path.
    */
  /** java.lang.Character.isWhitespace with an ASCII fast path — the
    * attribute scanners test whitespace per char and the full Unicode
    * check was a top parse-profile frame. Bit-identical to
    * Character.isWhitespace for c < 128 (0x09-0x0D, 0x1C-0x1F, 0x20).
    */
  @inline private[html] def isWs(c: Char): Boolean =
    if (c < 128) c == ' ' || (c >= '\t' && c <= '\r') || (c >= 28 && c <= 31)
    else Character.isWhitespace(c)

  /** `s.forall(_.isWhitespace)` without the per-char properties lookup
    * or the closure — runs once per text node in both tree walks. */
  private[html] def allWs(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!isWs(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /** `s.toLowerCase` with an identity fast path: tag/attr names out of
    * the interning tables are already-lowercase ASCII for all known
    * names, and String.toLowerCase scans the properties table per char
    * even when nothing changes (a top extraction-profile frame). */
  private[html] def lowerFast(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') return lowerAscii(s, i)
      if (c >= 128) return s.toLowerCase // locale rules may apply
      i += 1
    }
    s
  }

  private def lowerAscii(s: String, firstUpper: Int): String = {
    // verify pure ASCII first; mixed content defers to String.toLowerCase
    var i = firstUpper
    while (i < s.length) {
      if (s.charAt(i) >= 128) return s.toLowerCase
      i += 1
    }
    val out = new Array[Char](s.length)
    s.getChars(0, s.length, out, 0)
    i = firstUpper
    while (i < out.length) {
      val c = out(i)
      if (c >= 'A' && c <= 'Z') out(i) = (c + 32).toChar
      i += 1
    }
    new String(out)
  }

  /** Scan past attributes without materializing them. Returns
    * `(indexAfterTag << 1) | selfClosingBit` packed in one Long — this
    * runs once per element in the streaming walk, and the previous
    * (Boolean, Int) tuple was one allocation per tag. (Long, not Int:
    * an Int pack would overflow for inputs past 2^30 chars.)
    */
  private[html] def skipAttrs(s: String, from: Int): Long = {
    var i = from
    val n = s.length
    var selfClosing = false
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '/') {
        if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 1 }
        else i += 1
      } else {
        while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
               s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        while (i < n && isWs(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && isWs(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            while (i < n && s.charAt(i) != q) i += 1
            if (i < n) i += 1
          } else {
            while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
          }
        }
      }
    }
    (((if (i < n) i + 1 else n)).toLong << 1) | (if (selfClosing) 1L else 0L)
  }

  /** Parse attributes until '>' (or EOF). Returns (attrs, selfClosing,
    * index after '>').
    */
  /** Indexed first-wins copy into a node's attribute map — ArrayBuffer
    * iteration (foreach/toSeq) allocates a checked view per call, and
    * this runs once per element.
    */
  private def copyAttrs(attrs: mutable.ArrayBuffer[(String, String)], el: DomNode): Unit = {
    var k = 0
    while (k < attrs.length) {
      val kv = attrs(k)
      if (!el.attrs.contains(kv._1)) el.attrs(kv._1) = kv._2
      k += 1
    }
  }

  private[html] def readAttrs(s: String,
      from: Int): (mutable.ArrayBuffer[(String, String)], Boolean, Int) = {
    val attrs = mutable.ArrayBuffer.empty[(String, String)]
    val packed = readAttrsInto(s, from, attrs)
    (attrs, (packed & 1L) != 0, (packed >>> 1).toInt)
  }

  /** [[readAttrs]] into a caller-owned buffer, returning
    * `(indexAfterTag << 1) | selfClosingBit` like [[skipAttrs]]. The DOM
    * tokenizer copies attributes into the element immediately
    * ([[copyAttrs]]) and never retains the buffer, so it reuses ONE
    * buffer per parse — the per-tag ArrayBuffer + result tuple were ~1 GB
    * over a w19-sized allocation profile.
    */
  private[html] def readAttrsInto(s: String, from: Int,
      attrs: mutable.ArrayBuffer[(String, String)]): Long = {
    var i = from
    val n = s.length
    var selfClosing = false
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '/') {
        if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 1 }
        else i += 1
      } else {
        // attribute name
        val nameStart = i
        while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
               s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val name = AttrNames.lookup(s, nameStart, i)
        // skip ws
        while (i < n && isWs(s.charAt(i))) i += 1
        var value = ""
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && isWs(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            val vs = i
            // intrinsic scan to the closing quote (the per-char loop was
            // a top parse-profile site; quoted values dominate markup)
            i = s.indexOf(q, i)
            if (i < 0) i = n
            value = s.substring(vs, i)
            if (i < n) i += 1
          } else {
            val vs = i
            while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
            value = s.substring(vs, i)
          }
          value = Entities.decode(value)
        }
        if (name.nonEmpty) attrs += (name -> value)
      }
    }
    ((if (i < n) i + 1 else n).toLong << 1) | (if (selfClosing) 1L else 0L)
  }
}
