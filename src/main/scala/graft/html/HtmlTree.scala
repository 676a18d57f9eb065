package graft.html

import graft.core.Encodings

/** Parsed HTML document facade — the reference's `HTMLTree`
  * (resiliparse-py/resiliparse/parse/html.pyx:1674-1864).
  */
final class HtmlTree private (val document: DomNode) {

  /** The html element. */
  def documentElement: DomNode = {
    var c = document.firstChild
    while (c != null && !(c.isElement && c.tag == "html")) c = c.next
    c
  }

  def head: DomNode = {
    val html = documentElement
    var c = if (html != null) html.firstChild else null
    while (c != null && !(c.isElement && c.tag == "head")) c = c.next
    c
  }

  def body: DomNode = {
    val html = documentElement
    var c = if (html != null) html.firstChild else null
    while (c != null && !(c.isElement && c.tag == "body")) c = c.next
    c
  }

  /** Document title: the head's title text (html.pyx:1790-1807). An svg
    * <title> in the body is NOT the document title (quirks test).
    */
  def title: String = {
    val h = head
    if (h == null) return ""
    h.getElementsByTagName("title").headOption.map(_.text).getOrElse("")
  }

  def createElement(tag: String): DomNode = new DomNode(NodeType.Element, tag.toLowerCase)
  def createTextNode(text: String): DomNode = {
    val t = new DomNode(NodeType.Text, "#text")
    t.value = text
    t
  }

  override def toString: String = document.html
}

object HtmlTree {
  /** Parse from a string; never throws (unless a `maxNodes` budget is set
    * and breached — then [[graft.core.MemGuardException]], see
    * [[HtmlParser.parse]]).
    */
  def parse(html: String, maxNodes: Int = Int.MaxValue): HtmlTree =
    new HtmlTree(HtmlParser.parse(html, maxNodes))

  /** Charset resolve + resilient decode, the byte-input front half of
    * `parse_from_bytes` (html.pyx:1748-1767 semantics).
    */
  def decodeForParse(data: Array[Byte], charset: String = null): String = {
    val enc = Option(charset).filter(_.nonEmpty)
      .flatMap(c => Encodings.mapToHtml5(c, fallbackUtf8 = false))
      .orElse(Encodings.detectEncoding(data, fromHtmlMeta = true))
      .getOrElse("utf-8")
    Encodings.bytesToStr(data, enc)
  }

  /** Decode bytes (charset given or detected, WHATWG-remapped, resilient
    * ladder) then parse (html.pyx:1748-1767 semantics).
    */
  def parseFromBytes(data: Array[Byte], charset: String = null): HtmlTree =
    parse(decodeForParse(data, charset))
}
