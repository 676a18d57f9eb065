package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** DOM mutation surface — parity with the reference's mutation tests
  * (tests/resiliparse/parse/test_html.py mutation cases; API surface
  * resiliparse-py/resiliparse/parse/html.pyx:1216-1332,960-1069,
  * 1821-1857) plus the whole-document rewrite transforms built on it
  * (graft.html.HtmlRewrite).
  */
class HtmlMutationSpec extends AnyFunSuite {

  private def parse(h: String) = HtmlTree.parse(h)

  test("create_element / create_text_node / append_child") {
    val t = parse("<html><head></head><body></body></html>")
    val div = t.createElement("DIV")
    assert(div.tag == "div" && div.isElement)
    val txt = t.createTextNode("hello & <world>")
    div.appendChild(txt)
    t.body.appendChild(div)
    assert(t.body.html == "<body><div>hello &amp; &lt;world&gt;</div></body>")
    assert(txt.parent eq div)
    assert(div.parent.tag == "body")
  }

  test("insert_before / replace_child keep sibling links consistent") {
    val t = parse("<body><p id=\"a\">A</p><p id=\"c\">C</p></body>")
    val body = t.body
    val b = t.createElement("p")
    b.setattr("id", "b")
    b.appendChild(t.createTextNode("B"))
    val c = body.getElementById("c").get
    body.insertBefore(b, c)
    assert(body.childNodes.map(_.id) == Vector("a", "b", "c"))
    assert(b.prev.id == "a" && b.next.id == "c" && c.prev.id == "b")

    val d = t.createElement("p")
    d.setattr("id", "d")
    body.replaceChild(d, b)
    assert(body.childNodes.map(_.id) == Vector("a", "d", "c"))
    assert(b.parent == null && b.prev == null && b.next == null)
  }

  test("append_child of an attached node moves it (no duplicate link)") {
    val t = parse("<body><div id=\"x\"><span id=\"s\">S</span></div><div id=\"y\"></div></body>")
    val s = t.body.getElementById("s").get
    val y = t.body.getElementById("y").get
    y.appendChild(s)
    assert(t.body.html ==
      "<body><div id=\"x\"></div><div id=\"y\"><span id=\"s\">S</span></div></body>")
  }

  test("decompose detaches the whole subtree; detached node is a no-op") {
    val t = parse("<body><nav id=\"n\"><a href=\"/x\">x</a></nav><p>keep</p></body>")
    val nav = t.body.getElementById("n").get
    nav.decompose()
    assert(t.body.html == "<body><p>keep</p></body>")
    nav.decompose() // already detached: must not throw
    // subtree intact and re-attachable
    assert(nav.firstElementChild.tag == "a")
    t.body.appendChild(nav)
    assert(t.body.html == "<body><p>keep</p><nav id=\"n\"><a href=\"/x\">x</a></nav></body>")
  }

  test("setattr / delattr round-trip, case-insensitive") {
    val t = parse("<body><img src=\"a.png\"></body>")
    val img = t.body.getElementsByTagName("img").head
    img.setattr("Alt", "logo")
    assert(img.getattr("ALT").contains("logo"))
    assert(t.body.html == "<body><img src=\"a.png\" alt=\"logo\"></body>")
    assert(img.delattr("alt"))
    assert(!img.delattr("alt"))
    assert(img.getattr("alt").isEmpty)
    assert(t.body.html == "<body><img src=\"a.png\"></body>")
  }

  test("HtmlRewrite.removeSelector strips all matches") {
    val h = """<html><head><script>x()</script><title>T</title></head>
<body><p>keep</p><div class="ads banner">buy</div><script src="t.js"></script></body></html>"""
    val out = HtmlRewrite.removeSelector(h, "script, .ads")
    assert(!out.contains("script") && !out.contains("buy"))
    assert(out.contains("<title>T</title>") && out.contains("<p>keep</p>"))
  }

  test("HtmlRewrite.setAttr / delAttr over a selector") {
    val h = "<body><a href=\"/a\">a</a><a href=\"/b\" target=\"_self\">b</a></body>"
    val stamped = HtmlRewrite.setAttr(h, "a", "rel", "nofollow")
    assert(stamped.contains("<a href=\"/a\" rel=\"nofollow\">a</a>"))
    assert(stamped.contains("<a href=\"/b\" target=\"_self\" rel=\"nofollow\">b</a>"))
    val dropped = HtmlRewrite.delAttr(h, "a", "target")
    assert(!dropped.contains("target"))
  }

  test("HtmlRewrite.absolutizeLinks resolves relative URLs only") {
    val h = """<body><a href="/p/1">one</a><a href="sub/2">two</a>
<a href="https://other.example/abs">abs</a><a href="#frag">frag</a>
<a href="mailto:x@example.com">m</a><img src="../img.png"></body>"""
    val (out, n) = HtmlRewrite.absolutizeLinks(h, "http://site.example/dir/page.html")
    assert(n == 3)
    assert(out.contains("href=\"http://site.example/p/1\""))
    assert(out.contains("href=\"http://site.example/dir/sub/2\""))
    assert(out.contains("src=\"http://site.example/img.png\""))
    // untouched classes
    assert(out.contains("href=\"https://other.example/abs\""))
    assert(out.contains("href=\"#frag\""))
    assert(out.contains("href=\"mailto:x@example.com\""))
  }

  test("absolutizeLinks survives an unparseable base or href") {
    val h = "<body><a href=\"/x\">x</a><a href=\"::bad url::\">b</a></body>"
    assert(HtmlRewrite.absolutizeLinks(h, "not a uri ::")._2 == 0)
    val (out, n) = HtmlRewrite.absolutizeLinks(h, "http://e.example/")
    assert(n == 1 && out.contains("href=\"http://e.example/x\""))
    assert(out.contains("::bad url::"))
  }

  test("collectLinks resolves anchors and skips non-link schemes") {
    val h = """<body><a href="/p/1">r</a><a href="sub/2">s</a>
      <a href="https://other.example/abs">a</a><a href="#frag">f</a>
      <a href="mailto:x@e.com">m</a><a href="javascript:void(0)">j</a>
      <img src="/not-an-anchor.png"><a>no href</a></body>"""
    val links = HtmlRewrite.collectLinks(h, "http://site.example/dir/page.html")
    assert(links == Seq(
      "http://site.example/p/1",
      "http://site.example/dir/sub/2",
      "https://other.example/abs"))
    // unparseable base: absolute links still come through, relatives drop
    val links2 = HtmlRewrite.collectLinks(h, "not a uri ::")
    assert(links2 == Seq("https://other.example/abs"))
  }
}
