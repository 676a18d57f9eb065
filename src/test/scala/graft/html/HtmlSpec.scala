package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Parity subset of the reference's HTML tests
  * (tests/resiliparse/parse/test_html.py — structure :32-57, quirks
  * :78-111, selection :140-180, collections :184-218, attributes
  * :222-294, serialization :307-326, traversal :329-369, children
  * :372-398, real-world :515-530 in the WarcHtmlSpec).
  */
class HtmlSpec extends AnyFunSuite {

  private val html = """<!doctype html>
<html lang="en">
  <head>
    <meta charset="utf-8">
    <title>Example page</title>
  </head>
  <body>
    <main id="foo">
      <p id="a">Hello <span class="bar">world</span>!</p>
      <p id="b" class="dom">Hello <a href="https://example.com" class="bar baz">DOM</a>!</p>
     </main>
     <!-- A comment -->
  </body>
</html>"""

  test("document structure") {
    val tree = HtmlTree.parse(html)
    assert(tree.document.nodeType == NodeType.Document)
    assert(tree.document.tag == "#document")
    assert(tree.document.firstChild.nodeType == NodeType.DocumentType)
    assert(tree.head.nodeType == NodeType.Element && tree.head.tag == "head")
    assert(tree.body.nodeType == NodeType.Element && tree.body.tag == "body")
    assert(tree.body.html.startsWith("<body>") && tree.body.html.endsWith("</body>"))
    assert(tree.title == "Example page")
  }

  test("quirks: no head") {
    val t = HtmlTree.parse("""<!doctype html><body><span></span></body>""")
    assert(t.head != null && t.head.childNodes.isEmpty)
    assert(t.body != null && t.body.childNodes.size == 1)
  }

  test("quirks: no body") {
    val t = HtmlTree.parse("""<!doctype html><head><title>Title</title></head>""")
    assert(t.head.childNodes.size == 1)
    assert(t.title == "Title")
    assert(t.body != null && t.body.childNodes.isEmpty)
  }

  test("quirks: no title") {
    val t = HtmlTree.parse("""<!doctype html><head></head></body>""")
    assert(t.head.childNodes.isEmpty)
    assert(t.title == "")
    assert(t.body.childNodes.isEmpty)
  }

  test("quirks: svg title is not the document title") {
    val t = HtmlTree.parse(
      """<!doctype html><svg xmlns="http://www.w3.org/2000/svg"><title>SVG Title</title></svg>""")
    assert(t.head != null)
    assert(t.title == "")
    assert(t.body != null)
  }

  test("quirks: unclosed head") {
    val t = HtmlTree.parse("""<!doctype html><head><title>Title</title><span></span>""")
    assert(t.head.childNodes.size == 1)
    assert(t.title == "Title")
    assert(t.body.childNodes.size == 1)
  }

  test("selection") {
    val tree = HtmlTree.parse(html)
    assert(tree.body.getElementById("foo").get.tag == "main")
    val meta = tree.head.getElementsByTagName("meta")
    assert(meta.size == 1 && meta.head.tag == "meta")
    val barClass = tree.body.getElementsByClassName("bar")
    assert(barClass.map(_.tag) == Vector("span", "a"))
    val langEn = tree.document.getElementsByAttr("lang", "en")
    assert(langEn.size == 1 && langEn.head.tag == "html" && langEn.head.hasattr("lang"))
    val matchCss = tree.document.querySelector("body > main p:last-child")
    assert(matchCss.get.tag == "p" && matchCss.get.id == "b")
    val all = tree.body.querySelectorAll("main *")
    assert(all.map(_.tag) == Vector("p", "span", "p", "a"))
    assert(tree.body.matches(".bar"))
    assert(!tree.body.matches(".barbaz"))
    intercept[IllegalArgumentException] { tree.body.querySelector("..abc") }
  }

  test("collection-style compound selectors") {
    val tree = HtmlTree.parse(html)
    assert(tree.body.querySelector(".bar").get.tag == "span")
    assert(tree.body.querySelector(".bar.baz").get.tag == "a")
    assert(tree.body.querySelectorAll("span, a").size == 2)
    assert(tree.body.getElementsByAttr("href", "https://example.com").size == 1)
    assert(!tree.body.matches(".foo.bar.baz"))
  }

  test("attributes") {
    val tree = HtmlTree.parse(html)
    val a = tree.body.querySelector("#b a").get
    assert(a.hasattr("class"))
    assert(a.className == "bar baz")
    assert(a.classList == Seq("bar", "baz"))
    assert(a.getattr("id").isEmpty)
    assert(a.id == "")
    a.setattr("id", "abc")
    assert(a.id == "abc")
    assert(a.attrs.keys.toSeq == Seq("href", "class", "id"))
  }

  test("empty attributes") {
    val t = HtmlTree.parse("""<div>
    <input type="checkbox" checked>
    <div class="foo"></div>
    <div class></div>
    <div class=""></div>
    <div id="foo"></div>
    <div id></div>
    <div id=""></div>
    <div foo></div>
    <div foo=""></div>""")
    val input = t.body.querySelector("input").get
    assert(input.hasattr("type") && input.getattr("type").contains("checkbox"))
    assert(input.hasattr("checked") && input.getattr("checked").contains(""))
    assert(!input.hasattr("checkedx"))
    assert(t.body.querySelectorAll(".foo").size == 1)
    assert(t.body.querySelectorAll("#foo").size == 1)
    assert(t.body.querySelectorAll("[class]").size == 3)
    assert(t.body.querySelectorAll("[id]").size == 3)
    assert(t.body.getElementById("foo").isDefined)
    assert(t.body.getElementById("foox").isEmpty)
    assert(t.body.getElementsByClassName("foo").size == 1)
    assert(t.body.getElementsByClassName("").isEmpty)
    assert(t.body.getElementsByAttr("class", "foo").size == 1)
    assert(t.body.getElementsByAttr("class", "").size == 2)
    assert(t.body.getElementsByAttr("id", "").size == 2)
    assert(t.body.getElementsByAttr("foo", "").size == 2)
  }

  test("serialization") {
    val tree = HtmlTree.parse(html)
    assert(tree.body.getElementById("a").get.text == "Hello world!")
    assert(tree.body.getElementById("a").get.html ==
      """<p id="a">Hello <span class="bar">world</span>!</p>""")
    assert(tree.head.querySelector("title").get.html == "<title>Example page</title>")
    val text = tree.body.querySelector("#b").get.firstChild
    assert(text.nodeType == NodeType.Text)
    assert(text.text == "Hello ")
  }

  test("traversal order with text nodes") {
    val tree = HtmlTree.parse(html)
    val root = tree.body.getElementById("a").get
    val tags = root.iterateSubtree.map(_.tag).toList
    assert(tags == List("p", "#text", "span", "#text", "#text"))
    val foo = tree.body.getElementById("foo").get
    assert(foo.childNodes.map(_.tag) == Vector("#text", "p", "#text", "p", "#text"))
    assert(foo.childNodes.map(_.nodeType) == Vector(NodeType.Text, NodeType.Element,
      NodeType.Text, NodeType.Element, NodeType.Text))
  }

  test("start/end callback traversal builds the nested structure") {
    val tree = HtmlTree.parse(html)
    val sb = new StringBuilder
    DomTraversal.traverse(tree.body)(
      (n, _) => {
        if (n.isElement) sb.append('(').append(n.tag)
        else if (n.isText && n.value.trim.nonEmpty) sb.append(' ').append(n.value.trim)
        true
      },
      (n, _) => if (n.isElement) sb.append(')'))
    assert(sb.toString == "(body(main(p Hello(span world) !)(p Hello(a DOM) !)))")
  }

  test("children and siblings") {
    val tree = HtmlTree.parse(html)
    val el = tree.body.getElementById("a").get
    assert(el.firstChild.parent eq el)
    assert(el.firstChild.isText && el.firstChild.text == "Hello ")
    assert(el.firstElementChild.text == "world")
    assert(el.lastChild.text == "!")
    assert(el.lastElementChild eq el.firstElementChild)
    assert(el.firstChild.next.tag == "span")
    val el1 = tree.body.getElementById("foo").get.firstElementChild
    assert(el1.id == "a")
    assert(el1.nextElement.text == "Hello DOM!")
    assert(el1.prevElement == null)
    val el2 = tree.body.getElementById("foo").get.lastElementChild
    assert(el2.id == "b")
    assert(el2.prevElement eq el1)
    assert(el1.nextElement eq el2)
  }

  test("dom manipulation") {
    val tree = HtmlTree.parse(html)
    val p = tree.createElement("p")
    assert(p.parent == null && p.childNodes.isEmpty)
    val txt = tree.createTextNode("Hello!")
    p.appendChild(txt)
    assert(p.text == "Hello!" && (p.lastChild eq txt))
    assert(tree.body.querySelectorAll("main > *").size == 2)
    val main = tree.body.querySelector("main").get
    main.appendChild(p)
    assert(p.parent eq main)
    assert(tree.body.querySelectorAll("main > *").size == 3)
    assert(main.removeChild(p) eq p)
    assert(p.parent == null)
    assert(tree.body.querySelectorAll("main > *").size == 2)
    val div = tree.createElement("div")
    main.appendChild(p)
    main.replaceChild(div, p)
    assert(main.lastChild eq div)
    main.insertBefore(p, div)
    assert((main.lastChild eq div) && (main.lastChild.prev eq p))
  }

  test("entities decode in text and attributes") {
    val t = HtmlTree.parse(
      """<p title="a &amp; b">caf&eacute; &lt;tag&gt; &#233; &#xE9; &nbsp;x &unknown;</p>""")
    val p = t.body.querySelector("p").get
    assert(p.getattr("title").contains("a & b"))
    assert(p.text == "café <tag> é é  x &unknown;")
  }

  test("raw text elements are not tokenized as markup") {
    val t = HtmlTree.parse(
      """<head><script>if (a < b) { x = "<div>"; }</script><style>p > a { color: red }</style></head>""")
    assert(t.head.querySelector("script").get.text == """if (a < b) { x = "<div>"; }""")
    assert(t.head.querySelector("style").get.text == "p > a { color: red }")
    assert(t.body.childNodes.isEmpty)
  }

  test("implicit closes make tag soup nest sanely") {
    val t = HtmlTree.parse("<ul><li>one<li>two<li>three</ul><p>para1<p>para2")
    assert(t.body.querySelectorAll("li").map(_.text) == Vector("one", "two", "three"))
    assert(t.body.querySelectorAll("li").forall(_.parent.tag == "ul"))
    assert(t.body.querySelectorAll("p").map(_.text) == Vector("para1", "para2"))
  }

  test("pathological nesting is depth-capped, never a StackOverflowError") {
    val bomb = "<div>" * 100000 + "deep text"
    val t = HtmlTree.parse(bomb)
    assert(t.body.text.endsWith("deep text"))
    // every recursive consumer stays within stack bounds
    assert(t.body.html.nonEmpty)
    assert(t.body.querySelectorAll("div").nonEmpty)
    assert(Html2Text.extract(t, Html2Text.Options()).contains("deep text"))
    var depth = 0
    var n = t.body
    while (n != null) { depth += 1; n = n.firstChild }
    assert(depth <= 600, s"tree depth $depth exceeds the cap")
  }

  test("parse_from_bytes with charset and detection") {
    val t = HtmlTree.parseFromBytes(html.getBytes("UTF-16"), "utf-16")
    assert(t.title == "Example page")
    val t2 = HtmlTree.parseFromBytes(html.getBytes("UTF-8"))
    assert(t2.title == "Example page")
  }
}
