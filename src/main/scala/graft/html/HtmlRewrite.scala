package graft.html

/** DOM-mutation rewrite operations — the user-facing half of the
  * reference's mutation surface (append_child / insert_before /
  * replace_child / remove_child / decompose / setattr / create_element,
  * resiliparse-py/resiliparse/parse/html.pyx:1216-1332,960-1069,
  * 1821-1857), packaged as the whole-document transforms a cleaning
  * pipeline actually runs at scale: strip matching subtrees, stamp or
  * drop attributes, absolutize links. The DOM lives only inside the
  * kernel (SURVEY §1.4); input and output are strings.
  */
object HtmlRewrite {

  /** Decompose every node matching `selector` and serialize what's left. */
  def removeSelector(html: String, selector: String): String = {
    val tree = HtmlTree.parse(html)
    tree.document.querySelectorAll(selector).foreach(_.decompose())
    tree.document.html
  }

  /** Set `name=value` on every node matching `selector`. */
  def setAttr(html: String, selector: String, name: String, value: String): String = {
    val tree = HtmlTree.parse(html)
    tree.document.querySelectorAll(selector).foreach(_.setattr(name, value))
    tree.document.html
  }

  /** Delete attribute `name` from every node matching `selector`. */
  def delAttr(html: String, selector: String, name: String): String = {
    val tree = HtmlTree.parse(html)
    tree.document.querySelectorAll(selector).foreach(_.delattr(name))
    tree.document.html
  }

  /** URL attributes rewritten by [[absolutizeLinks]], per tag. */
  private val UrlAttrs: Map[String, Seq[String]] = Map(
    "a" -> Seq("href"), "link" -> Seq("href"), "area" -> Seq("href"),
    "img" -> Seq("src"), "script" -> Seq("src"), "iframe" -> Seq("src"),
    "source" -> Seq("src"), "audio" -> Seq("src"), "video" -> Seq("src", "poster"),
    "embed" -> Seq("src"), "form" -> Seq("action"))

  /** Not a document link at all: empty, fragment-only, or a
    * javascript:/mailto:/data: pseudo-target. Shared by the rewrite and
    * the link-graph passes so they can never disagree on what counts as
    * a link.
    */
  private def isNonLinkTarget(t: String): Boolean =
    t.isEmpty || t.startsWith("#") ||
      t.regionMatches(true, 0, "javascript:", 0, 11) ||
      t.regionMatches(true, 0, "mailto:", 0, 7) ||
      t.regionMatches(true, 0, "data:", 0, 5)

  private def hasScheme(t: String): Boolean =
    t.matches("(?i)[a-z][a-z0-9+.-]*:.*")

  private def skipScheme(v: String): Boolean = {
    val t = v.trim
    // non-links skipped; already-absolute (has a scheme) left untouched
    isNonLinkTarget(t) || hasScheme(t)
  }

  /** Resolve every relative URL attribute against `baseUrl` (RFC 3986 via
    * java.net.URI). Unresolvable values are left unchanged; absolute
    * URLs, fragments, and javascript:/mailto:/data: are skipped. Returns
    * (rewritten html, number of attributes rewritten).
    */
  def absolutizeLinks(html: String, baseUrl: String): (String, Int) = {
    val base =
      try new java.net.URI(baseUrl)
      catch { case _: Exception => return (html, 0) }
    val tree = HtmlTree.parse(html)
    var n = 0
    DomTraversal.preOrderDocument(tree.document) { node =>
      if (node.isElement) UrlAttrs.get(node.tag).foreach { attrs =>
        attrs.foreach { a =>
          node.getattr(a).foreach { v =>
            if (!skipScheme(v)) {
              try {
                val abs = base.resolve(v.trim).toString
                if (abs != v) { node.setattr(a, abs); n += 1 }
              } catch { case _: Exception => () }
            }
          }
        }
      }
      true
    }
    (tree.document.html, n)
  }

  /** Collect every `a[href]` target absolutized against `baseUrl`, in
    * document order (the link-graph extraction pass; same skip rules as
    * [[absolutizeLinks]] — fragments, javascript:/mailto:/data: are not
    * links). Values that fail RFC 3986 resolution are dropped.
    */
  def collectLinks(html: String, baseUrl: String): Seq[String] = {
    val base =
      try new java.net.URI(baseUrl)
      catch { case _: Exception => null }
    val tree = HtmlTree.parse(html)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    DomTraversal.preOrderDocument(tree.document) { node =>
      if (node.isElement && node.tag == "a") {
        node.getattr("href").foreach { v =>
          val t = v.trim
          if (!isNonLinkTarget(t)) {
            if (hasScheme(t)) out += t
            else if (base != null) {
              try out += base.resolve(t).toString
              catch { case _: Exception => () }
            }
          }
        }
      }
      true
    }
    out.toSeq
  }
}
