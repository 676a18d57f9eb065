package graft.html

import scala.collection.mutable

/** Node types mirroring the reference's DOM surface
  * (resiliparse-py/resiliparse/parse/html.pyx:522-958; WHATWG-style trait
  * hierarchy resiliparse/src/parse/html/dom/traits.rs:180-688).
  */
object NodeType extends Enumeration {
  val Document, DocumentType, Element, Text, Comment = Value
}

/** Minimal node surface the html2text extraction callback reads — lets
  * the DOM walk and the streaming (DOM-free) tokenizer share the same
  * callback verbatim.
  */
trait NodeView {
  def isText: Boolean
  def isElement: Boolean
  def tag: String
  def value: String
  /** Tag-category bitmask ([[HtmlParser.TagFlags]]); 0 for text nodes. */
  private[html] def tagFlags: Int =
    if (isElement) HtmlParser.TagFlags(tag) else 0
  def getattr(name: String): Option[String]
  /** Backing DOM node when one exists (serializer's minimal-html checks). */
  def domOrNull: DomNode
  /** Append this node's text value to `sb` — overridable so a streaming
    * view can hand over an input slice without materializing the
    * intermediate String (the extraction hot path's text copies).
    */
  def appendValueTo(sb: StringBuilder): Unit =
    if (value != null) sb.append(value)
}

/** A mutable DOM node (linked-list siblings, parent pointer) — the
  * ephemeral per-document tree the engine materializes INSIDE expressions;
  * never a Spark column (SURVEY §1.4).
  */
final class DomNode(val nodeType: NodeType.Value, val tag: String) extends NodeView {
  def domOrNull: DomNode = this

  /** Tag-category bitmask ([[HtmlParser.TagFlags]]), resolved once at
    * creation so the tree builder's per-stack-entry category tests are
    * field reads instead of Set probes.
    */
  private[html] val flags: Int =
    if (nodeType == NodeType.Element) HtmlParser.TagFlags(tag) else 0
  override private[html] def tagFlags: Int = flags

  /** Parser-internal: whether this element is currently on the open
    * -element stack — gives the active-formatting-list reconstruction
    * check its O(1) fast path (see HtmlParser.reconstruct).
    */
  private[html] var onStack: Boolean = false

  /** Extraction-internal per-node scratch slot (Html2Text's text stats):
    * replacing the IdentityHashMap<node, stats> lookup with a field read
    * was worth ~15% of main-content extraction. Overwritten wholesale by
    * every stats build, so stale values from a prior extraction of the
    * same tree are unreachable.
    */
  private[html] var extractScratch: AnyRef = null

  /** Text/comment content; null for non-character nodes. */
  var value: String = _

  var parent: DomNode = _
  var firstChild: DomNode = _
  var lastChild: DomNode = _
  var next: DomNode = _
  var prev: DomNode = _

  /** Ordered attribute map (elements only), allocated on first use —
    * text nodes (the majority of most documents) never pay for one.
    */
  private var _attrs: mutable.LinkedHashMap[String, String] = _
  def attrs: mutable.LinkedHashMap[String, String] = {
    if (_attrs == null) _attrs = mutable.LinkedHashMap.empty
    _attrs
  }

  private[html] def attrsOrNull: mutable.LinkedHashMap[String, String] = _attrs

  def isElement: Boolean = nodeType == NodeType.Element
  def isText: Boolean = nodeType == NodeType.Text

  def getattr(name: String): Option[String] =
    if (_attrs == null) None else _attrs.get(name.toLowerCase)
  def hasattr(name: String): Boolean =
    _attrs != null && _attrs.contains(name.toLowerCase)
  def setattr(name: String, v: String): Unit = attrs(name.toLowerCase) = v
  def id: String = getattr("id").getOrElse("")
  def className: String = getattr("class").getOrElse("")
  def classList: Seq[String] = {
    val s = className
    if (s.isEmpty) return Nil
    val b = List.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) b += s.substring(start, i)
    }
    b.result()
  }

  /** Whitespace-token membership over the class attribute without
    * tokenizing (selector-match hot path: no regex, no allocation).
    */
  def hasClassToken(token: String): Boolean = {
    if (_attrs == null || token.isEmpty) return false
    val s = _attrs.getOrElse("class", null)
    if (s == null) return false
    DomNode.hasToken(s, token)
  }

  def childNodes: Vector[DomNode] = {
    val b = Vector.newBuilder[DomNode]
    var c = firstChild
    while (c != null) { b += c; c = c.next }
    b.result()
  }

  def firstElementChild: DomNode = {
    var c = firstChild
    while (c != null && !c.isElement) c = c.next
    c
  }
  def lastElementChild: DomNode = {
    var c = lastChild
    while (c != null && !c.isElement) c = c.prev
    c
  }
  def nextElement: DomNode = {
    var c = next
    while (c != null && !c.isElement) c = c.next
    c
  }
  def prevElement: DomNode = {
    var c = prev
    while (c != null && !c.isElement) c = c.prev
    c
  }

  def appendChild(c: DomNode): DomNode = {
    if (c.parent != null) c.parent.removeChild(c)
    c.parent = this
    c.prev = lastChild
    c.next = null
    if (lastChild != null) lastChild.next = c else firstChild = c
    lastChild = c
    c
  }

  def insertBefore(c: DomNode, ref: DomNode): DomNode = {
    if (ref == null) return appendChild(c)
    if (c eq ref) return c // "before itself" is a no-op, never a self-loop
    if (c.parent != null) c.parent.removeChild(c)
    c.parent = this
    c.next = ref
    c.prev = ref.prev
    if (ref.prev != null) ref.prev.next = c else firstChild = c
    ref.prev = c
    c
  }

  def removeChild(c: DomNode): DomNode = {
    require(c.parent eq this, "not a child of this node")
    if (c.prev != null) c.prev.next = c.next else firstChild = c.next
    if (c.next != null) c.next.prev = c.prev else lastChild = c.prev
    c.parent = null; c.prev = null; c.next = null
    c
  }

  def replaceChild(newChild: DomNode, oldChild: DomNode): DomNode = {
    insertBefore(newChild, oldChild)
    removeChild(oldChild)
  }

  /** Detach this node (and its whole subtree) from the tree — the
    * reference's `decompose` (html.pyx:960-1004). No-op when already
    * detached; the subtree stays intact and re-attachable.
    */
  def decompose(): Unit = if (parent != null) parent.removeChild(this)

  /** Remove an attribute (case-insensitive); true if it was present
    * (html.pyx:1216-1248 `delattr` semantics).
    */
  def delattr(name: String): Boolean =
    _attrs != null && _attrs.remove(name.toLowerCase).isDefined

  /** Concatenated descendant text (Element.text semantics,
    * html.pyx:714-746).
    */
  def text: String = {
    if (isText || nodeType == NodeType.Comment) return if (value == null) "" else value
    val sb = new StringBuilder
    // document-tree semantics: template content is a separate fragment,
    // so textContent excludes it (template.text itself is "")
    DomTraversal.preOrderDocument(this) { n =>
      if (n.isText && n.value != null) sb.append(n.value)
      true
    }
    sb.toString
  }

  /** Serialized outer HTML. */
  def html: String = {
    val sb = new StringBuilder
    Serializer.serialize(this, sb)
    sb.toString
  }

  /** Pre-order iterator over this subtree (node itself included),
    * matching the reference's stepwise traversal (html.pyx:117-151).
    */
  def iterateSubtree: Iterator[DomNode] = {
    val b = Vector.newBuilder[DomNode]
    DomTraversal.preOrderDocument(this) { n => b += n; true }
    b.result().iterator
  }

  /** All element descendants (strict: this node excluded). */
  def descendantElements: Vector[DomNode] = {
    val b = Vector.newBuilder[DomNode]
    DomTraversal.preOrderDocument(this) { n =>
      if ((n ne this) && n.isElement) b += n
      true
    }
    b.result()
  }

  // — selection (reference surface html.pyx:1071-1214) —
  def querySelector(selector: String): Option[DomNode] =
    CssSelector.parse(selector).firstMatch(this)
  def querySelectorAll(selector: String): Vector[DomNode] =
    CssSelector.parse(selector).allMatches(this)
  /** True if ANY element in the subtree matches (html.pyx:1109-1123). */
  def matches(selector: String): Boolean =
    CssSelector.parse(selector).firstMatch(this).isDefined

  def getElementById(idv: String): Option[DomNode] =
    descendantElements.find(_.getattr("id").contains(idv))
  def getElementsByTagName(t: String): Vector[DomNode] =
    descendantElements.filter(_.tag == t.toLowerCase)
  def getElementsByClassName(cls: String): Vector[DomNode] =
    if (cls.isEmpty) Vector.empty
    else descendantElements.filter(_.classList.contains(cls))
  def getElementsByAttr(name: String, v: String): Vector[DomNode] =
    descendantElements.filter(_.getattr(name).contains(v))

  // — case-insensitive selection variants (html.pyx:1125-1196 take a
  //   case_insensitive flag on id / attr / class lookups) —
  def getElementByIdCase(idv: String, caseInsensitive: Boolean): Option[DomNode] =
    if (!caseInsensitive) getElementById(idv)
    else descendantElements.find(_.getattr("id").exists(_.equalsIgnoreCase(idv)))
  def getElementsByAttrCase(name: String, v: String,
      caseInsensitive: Boolean): Vector[DomNode] =
    if (!caseInsensitive) getElementsByAttr(name, v)
    else descendantElements.filter(_.getattr(name).exists(_.equalsIgnoreCase(v)))
  def getElementsByClassNameCase(cls: String,
      caseInsensitive: Boolean): Vector[DomNode] =
    if (!caseInsensitive) getElementsByClassName(cls)
    else if (cls.isEmpty) Vector.empty
    else descendantElements.filter(_.classList.exists(_.equalsIgnoreCase(cls)))

  // — WHATWG element/node conveniences (dom/traits.rs:254-588 surface;
  //   the subset with meaning in a tolerant single-document DOM) —

  /** Direct element children (`ParentNode.children`). */
  def children: Vector[DomNode] = {
    val b = Vector.newBuilder[DomNode]
    var c = firstChild
    while (c != null) { if (c.isElement) b += c; c = c.next }
    b.result()
  }

  def childElementCount: Int = {
    var n = 0
    var c = firstChild
    while (c != null) { if (c.isElement) n += 1; c = c.next }
    n
  }

  /** Inclusive subtree membership (`Node.contains`). */
  def contains(other: DomNode): Boolean = {
    var p = other
    var steps = 0
    while (p != null && steps < (1 << 20)) {
      if (p eq this) return true
      p = p.parent
      steps += 1
    }
    false
  }

  /** Nearest inclusive ancestor matching `selector` (`Element.closest`). */
  def closest(selector: String): Option[DomNode] = {
    val sel = CssSelector.parse(selector)
    var p = this
    while (p != null) {
      if (p.isElement && sel.matchesNode(p)) return Some(p)
      p = p.parent
    }
    None
  }

  /** Copy of this node; `deep` copies the whole subtree
    * (`Node.cloneNode`). The clone is detached.
    */
  def cloneNode(deep: Boolean = false): DomNode = {
    val c = new DomNode(nodeType, tag)
    c.value = value
    if (_attrs != null) _attrs.foreach { case (k, v) => c.attrs(k) = v }
    if (deep) {
      var ch = firstChild
      while (ch != null) { c.appendChild(ch.cloneNode(deep = true)); ch = ch.next }
    }
    c
  }

  /** `Element.toggleAttribute`: with no `force`, flip presence; with
    * `force`, add (true) or remove (false). Returns presence after.
    */
  def toggleAttribute(name: String, force: Option[Boolean] = None): Boolean = {
    val want = force.getOrElse(!hasattr(name))
    if (want) { if (!hasattr(name)) setattr(name, "") }
    else delattr(name)
    want
  }

  /** Detach from the parent (`ChildNode.remove`, alias of decompose). */
  def remove(): Unit = decompose()

  /** Insert `nodes` before this node in its parent (`ChildNode.before`). */
  def before(ns: DomNode*): Unit =
    if (parent != null) ns.foreach(parent.insertBefore(_, this))

  /** Insert `nodes` after this node in its parent (`ChildNode.after`). */
  def after(ns: DomNode*): Unit =
    if (parent != null) {
      var ref = next
      ns.foreach { n =>
        if (ref == null) parent.appendChild(n) else parent.insertBefore(n, ref)
      }
    }

  /** Replace this node with `nodes` (`ChildNode.replaceWith`). */
  def replaceWith(ns: DomNode*): Unit =
    if (parent != null) { before(ns: _*); parent.removeChild(this) }

  /** Insert before the first child (`ParentNode.prepend`). */
  def prepend(ns: DomNode*): Unit = {
    val ref = firstChild
    ns.foreach { n => if (ref == null) appendChild(n) else insertBefore(n, ref) }
  }

  /** Replace all children (`ParentNode.replaceChildren`). */
  def replaceChildren(ns: DomNode*): Unit = {
    while (firstChild != null) removeChild(firstChild)
    ns.foreach(appendChild)
  }

  /** Set the node's text contents, replacing all children — the
    * reference's `text` setter (html.pyx:763-770; WHATWG textContent
    * set: empty string leaves no children).
    */
  def setText(t: String): Unit = {
    while (firstChild != null) removeChild(firstChild)
    if (t.nonEmpty) {
      val tn = new DomNode(NodeType.Text, "#text")
      tn.value = t
      appendChild(tn)
    }
  }

  /** Set the node's INNER HTML from markup, replacing all children —
    * the reference's `html` setter (html.pyx:789-796,
    * lxb_html_element_inner_html_set). Fragment parsing is tolerant:
    * the markup is parsed as a document and the resulting body (or, for
    * head-only content, head) children are adopted.
    */
  def setHtml(markup: String): Unit = {
    while (firstChild != null) removeChild(firstChild)
    val doc = HtmlParser.parse(markup)
    var html = doc.firstChild
    while (html != null && !(html.isElement && html.tag == "html")) html = html.next
    if (html == null) return
    var body: DomNode = null
    var head: DomNode = null
    var c = html.firstChild
    while (c != null) {
      if (c.isElement && c.tag == "body") body = c
      if (c.isElement && c.tag == "head") head = c
      c = c.next
    }
    // adopt HEAD-routed children first, then body: the tolerant parser
    // routes <style>/<title>/<meta> in a mixed fragment to head, and
    // WHATWG innerHTML on a body-context element keeps ALL of them —
    // taking only one of the two silently dropped the other's children
    for (src <- Seq(head, body) if src != null) {
      var ch = src.firstChild
      while (ch != null) { val nx = ch.next; appendChild(ch); ch = nx }
    }
  }

  /** Add a class token if absent — the reference's `class_list.add`
    * whitespace behavior (html.pyx:439-460: appended with a single
    * separating space unless the current value already ends in one).
    */
  def addClass(cls: String): Unit = {
    if (classList.contains(cls)) return
    val cur = className
    val nv = if (cur.isEmpty) cls
      else if (Character.isWhitespace(cur.charAt(cur.length - 1))) cur + cls
      else cur + " " + cls
    setattr("class", nv)
  }

  /** Remove a class token — the reference's `class_list.remove`
    * (html.pyx:462-477: remaining tokens re-joined with single spaces).
    */
  def removeClass(cls: String): Unit =
    setattr("class", classList.filterNot(_ == cls).mkString(" "))

  // — CharacterData operations (dom/traits.rs:606-680) on text/comment
  //   nodes; no-ops / empty on others —
  def dataLength: Int = if (value == null) 0 else value.length
  def substringData(offset: Int, count: Int): String = {
    if (value == null) return ""
    val from = math.max(0, math.min(offset, value.length))
    val to = math.max(from, math.min(from.toLong + count, value.length.toLong).toInt)
    value.substring(from, to)
  }
  def appendData(data: String): Unit =
    value = (if (value == null) "" else value) + data
  def insertData(offset: Int, data: String): Unit = {
    val v = if (value == null) "" else value
    val at = math.max(0, math.min(offset, v.length))
    value = v.substring(0, at) + data + v.substring(at)
  }
  def deleteData(offset: Int, count: Int): Unit = {
    val v = if (value == null) "" else value
    val from = math.max(0, math.min(offset, v.length))
    val to = math.max(from, math.min(from.toLong + count, v.length.toLong).toInt)
    value = v.substring(0, from) + v.substring(to)
  }
  def replaceData(offset: Int, count: Int, data: String): Unit = {
    deleteData(offset, count)
    insertData(offset, data)
  }

  override def toString: String = nodeType match {
    case NodeType.Element => s"<$tag>"
    case NodeType.Text => if (value == null) "" else value
    case NodeType.Comment => s"<!--$value-->"
    case NodeType.Document => "[HTML Document]"
    case NodeType.DocumentType => "<!DOCTYPE html>"
  }
}

object DomNode {
  /** Whether `s` contains `token` as a whitespace-delimited word. */
  def hasToken(s: String, token: String): Boolean = {
    val n = s.length
    val m = token.length
    if (m == 0 || m > n) return false
    var i = 0
    while (i <= n - m) {
      if (s.startsWith(token, i) &&
          (i == 0 || Character.isWhitespace(s.charAt(i - 1))) &&
          (i + m == n || Character.isWhitespace(s.charAt(i + m))))
        return true
      i += 1
    }
    false
  }
}

object DomTraversal {
  /** Pre-order walk; `visit` returns false to skip the node's subtree. */
  def preOrder(root: DomNode)(visit: DomNode => Boolean): Unit = {
    def rec(n: DomNode): Unit = {
      if (visit(n)) {
        var c = n.firstChild
        while (c != null) { rec(c); c = c.next }
      }
    }
    rec(root)
  }

  /** Pre-order walk in DOCUMENT-tree semantics: per WHATWG (and the
    * reference's lexbor backend, tree.rs:63-89) template children live
    * in a separate content FRAGMENT, not the document tree — so this
    * walk visits a template element itself but never descends into it.
    * The content stays physically attached (serialization round-trips
    * it like browser innerHTML; `childNodes` is the `.content` access
    * path); this boundary is what makes selectors, `text`, and subtree
    * iteration agree with the reference.
    */
  def preOrderDocument(root: DomNode)(visit: DomNode => Boolean): Unit =
    preOrder(root)(n => visit(n) && !(n.isElement && n.tag == "template"))

  /** Stepwise traversal with start/end callbacks and depth tracking —
    * the reference's traverse_dom / next_node with end-tag flag
    * (html.pyx:117-151,1885-1935). `start` returns false to skip the
    * subtree (the end callback still fires for the skipped node).
    */
  def traverse(root: DomNode)(
      start: (DomNode, Int) => Boolean, end: (DomNode, Int) => Unit): Unit = {
    def rec(n: DomNode, depth: Int): Unit = {
      val descend = start(n, depth)
      if (descend) {
        var c = n.firstChild
        while (c != null) { rec(c, depth + 1); c = c.next }
      }
      end(n, depth)
    }
    rec(root, 0)
  }
}

object Serializer {
  /** Void elements per HTML5 (no end tag). */
  val VoidElements: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def escapeAttr(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def serialize(n: DomNode, sb: StringBuilder): Unit = n.nodeType match {
    case NodeType.Document =>
      var c = n.firstChild
      while (c != null) { serialize(c, sb); c = c.next }
    case NodeType.DocumentType =>
      sb.append("<!DOCTYPE ").append(if (n.value == null) "html" else n.value).append('>')
    case NodeType.Comment =>
      sb.append("<!--").append(if (n.value == null) "" else n.value).append("-->")
    case NodeType.Text =>
      // script/style contents serialize raw
      val rawParent = n.parent != null &&
        (n.parent.tag == "script" || n.parent.tag == "style")
      sb.append(if (rawParent) n.value else escapeText(if (n.value == null) "" else n.value))
    case NodeType.Element =>
      sb.append('<').append(n.tag)
      val as = n.attrsOrNull
      if (as != null) as.foreach { case (k, v) =>
        sb.append(' ').append(k)
        if (v != null) sb.append("=\"").append(escapeAttr(v)).append('"')
      }
      sb.append('>')
      if (!VoidElements.contains(n.tag)) {
        var c = n.firstChild
        while (c != null) { serialize(c, sb); c = c.next }
        sb.append("</").append(n.tag).append('>')
      }
  }
}
