package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** The WHATWG DOM surface beyond the pipeline-used subset — the
  * reference exposes these on every node (resiliparse-py/resiliparse/
  * parse/html.pyx:403-1361 python surface; resiliparse/src/parse/html/
  * dom/traits.rs:254-680 trait surface). Behaviors pinned against the
  * documented reference semantics.
  */
class DomApiSpec extends AnyFunSuite {

  private def doc(html: String): HtmlTree = HtmlTree.parse(html)

  test("children / childElementCount see only element children") {
    val t = doc("<body><div>a<span>b</span>text<p>c</p></div></body>")
    val div = t.body.firstElementChild
    assert(div.children.map(_.tag) == Vector("span", "p"))
    assert(div.childElementCount == 2)
  }

  test("contains is inclusive subtree membership") {
    val t = doc("<div id=a><p id=b><em id=c>x</em></p></div>")
    val a = t.body.getElementById("a").get
    val c = t.body.getElementById("c").get
    assert(a.contains(a))
    assert(a.contains(c))
    assert(!c.contains(a))
  }

  test("closest walks inclusive ancestors") {
    val t = doc("<div class=outer><section><p id=x>t</p></section></div>")
    val p = t.body.getElementById("x").get
    assert(p.closest("p").map(_.tag).contains("p")) // self matches
    assert(p.closest(".outer").map(_.tag).contains("div"))
    assert(p.closest("article").isEmpty)
  }

  test("cloneNode shallow vs deep, detached, attrs copied") {
    val t = doc("<div id=a class='x y'><p>child</p></div>")
    val a = t.body.getElementById("a").get
    val shallow = a.cloneNode()
    assert(shallow.parent == null && shallow.firstChild == null)
    assert(shallow.getattr("class").contains("x y"))
    val deep = a.cloneNode(deep = true)
    assert(deep.firstChild.tag == "p" && deep.text == "child")
    // mutating the clone leaves the original alone
    deep.firstChild.setText("changed")
    assert(a.text == "child")
  }

  test("toggleAttribute flips, forces, and reports presence") {
    val t = doc("<input id=i>")
    val i = t.body.getElementById("i").get
    assert(i.toggleAttribute("disabled"))
    assert(i.hasattr("disabled"))
    assert(!i.toggleAttribute("disabled"))
    assert(!i.hasattr("disabled"))
    assert(i.toggleAttribute("checked", force = Some(true)))
    assert(i.toggleAttribute("checked", force = Some(true))) // stays present
    assert(!i.toggleAttribute("checked", force = Some(false)))
    assert(!i.hasattr("checked"))
  }

  test("before / after / replaceWith / prepend / replaceChildren") {
    val t = doc("<ul><li id=b>B</li></ul>")
    val ul = t.body.querySelector("ul").get
    val b = t.body.getElementById("b").get
    val a = t.createElement("li"); a.setText("A")
    val c = t.createElement("li"); c.setText("C")
    b.before(a)
    b.after(c)
    assert(ul.children.map(_.text) == Vector("A", "B", "C"))
    val x = t.createElement("li"); x.setText("X")
    b.replaceWith(x)
    assert(ul.children.map(_.text) == Vector("A", "X", "C"))
    val first = t.createElement("li"); first.setText("0")
    ul.prepend(first)
    assert(ul.children.head.text == "0")
    val only = t.createElement("li"); only.setText("only")
    ul.replaceChildren(only)
    assert(ul.children.map(_.text) == Vector("only"))
  }

  test("setText replaces children; empty leaves none (WHATWG textContent)") {
    val t = doc("<div id=d><p>old</p><p>older</p></div>")
    val d = t.body.getElementById("d").get
    d.setText("fresh")
    assert(d.childNodes.size == 1 && d.text == "fresh")
    d.setText("")
    assert(d.firstChild == null && d.text == "")
  }

  test("setHtml parses a fragment into the children (inner-html set)") {
    val t = doc("<div id=d>old</div>")
    val d = t.body.getElementById("d").get
    d.setHtml("<p>one</p><p>two <b>bold</b></p>")
    assert(d.children.map(_.tag) == Vector("p", "p"))
    assert(d.text == "onetwo bold")
    // html getter stays OUTER serialization, like the reference's
    // property pair (outer get, inner set)
    assert(d.html.startsWith("<div"))
  }

  test("setHtml keeps head-routed fragment children (style + content mix)") {
    val t = doc("<div id=d>old</div>")
    val d = t.body.getElementById("d").get
    // the tolerant parser routes <style> to head and <p> to body; inner
    // set must keep BOTH (WHATWG fragment parsing on a div keeps all)
    d.setHtml("<style>.x{}</style><p>hi</p>")
    assert(d.children.map(_.tag) == Vector("style", "p"),
      s"got ${d.children.map(_.tag)}")
    assert(d.text.contains("hi"))
  }

  test("addClass / removeClass follow the reference whitespace rules") {
    val t = doc("<div id=d class='one two '>x</div>")
    val d = t.body.getElementById("d").get
    d.addClass("two") // present: no change
    assert(d.className == "one two ")
    d.addClass("three") // trailing ws: no extra separator
    assert(d.className == "one two three")
    d.removeClass("two") // re-joined single-spaced
    assert(d.className == "one three")
    d.removeClass("nope")
    assert(d.className == "one three")
    val bare = t.createElement("div")
    bare.addClass("solo")
    assert(bare.className == "solo")
  }

  test("case-insensitive id / attr / class lookups") {
    val t = doc("<div id=Main class=Hero data-kind=Story>x</div>")
    val b = t.body
    assert(b.getElementById("main").isEmpty)
    assert(b.getElementByIdCase("MAIN", caseInsensitive = true).isDefined)
    assert(b.getElementsByAttrCase("data-kind", "story", caseInsensitive = true).size == 1)
    assert(b.getElementsByAttrCase("data-kind", "story", caseInsensitive = false).isEmpty)
    assert(b.getElementsByClassNameCase("hero", caseInsensitive = true).size == 1)
    assert(b.getElementsByClassName("hero").isEmpty)
  }

  test("CharacterData operations on a text node") {
    val t = doc("<p id=p>Hello world</p>")
    val tn = t.body.getElementById("p").get.firstChild
    assert(tn.dataLength == 11)
    assert(tn.substringData(6, 5) == "world")
    assert(tn.substringData(6, 99) == "world") // clamped
    tn.appendData("!")
    assert(tn.value == "Hello world!")
    tn.insertData(5, ",")
    assert(tn.value == "Hello, world!")
    tn.deleteData(5, 1)
    assert(tn.value == "Hello world!")
    tn.replaceData(6, 5, "DOM")
    assert(tn.value == "Hello DOM!")
  }
}
