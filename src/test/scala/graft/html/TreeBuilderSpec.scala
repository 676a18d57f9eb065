package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the WHATWG tree-construction rules the tolerant parser
  * implements beyond basic tag nesting: the adoption agency algorithm
  * (active formatting elements, reconstruction, Noah's Ark, markers),
  * foster parenting of misplaced table content, and `<template>`
  * content. Expected trees follow the html5lib-tests expectations for
  * the same inputs (the reference's lexbor backend is spec-complete, so
  * these pin output parity on misnested real-world markup).
  */
class TreeBuilderSpec extends AnyFunSuite {

  private def bodyHtml(input: String): String = {
    val t = HtmlTree.parse(input)
    val sb = new StringBuilder
    var c = t.body.firstChild
    while (c != null) { Serializer.serialize(c, sb); c = c.next }
    sb.toString
  }

  // — adoption agency —

  test("AAA: the canonical b/div misnest") {
    assert(bodyHtml("<b>1<div>2</b>3</div>") ==
      "<b>1</b><div><b>2</b>3</div>")
  }

  test("AAA: simple b/i misnest leaves italic residue") {
    assert(bodyHtml("<b><i>x</b>y</i>z") == "<b><i>x</i></b><i>y</i>z")
  }

  test("AAA: formatting reconstructs across block boundaries") {
    // </p> pops <b> from the stack but not the list -> y re-opens a clone
    assert(bodyHtml("<p><b>x</p><p>y</p>") ==
      "<p><b>x</b></p><p><b>y</b></p>")
  }

  test("AAA: nested <a> closes the previous link") {
    assert(bodyHtml("<a href=\"1\">x<a href=\"2\">y</a>") ==
      "<a href=\"1\">x</a><a href=\"2\">y</a>")
  }

  test("AAA: cell marker stops formatting from leaking out") {
    // td pushes a scope marker: the unclosed <b> dies with the cell
    // (y lands in row context and fosters before the table)
    assert(bodyHtml("<table><tr><td><b>x</td>y</table>z") ==
      "y<table><tbody><tr><td><b>x</b></td></tr></tbody></table>z")
  }

  test("stray td/tr outside any table are dropped, their content kept") {
    assert(bodyHtml("<td><b>x</td>y") == "<b>xy</b>")
    assert(bodyHtml("a<tr>b<td>c") == "abc")
    // inside a template the fragment is legitimate and kept
    assert(bodyHtml("<body><template><tr><td>cell</td></tr></template>") ==
      "<template><tr><td>cell</td></tr></template>")
  }

  test("AAA: matched formatting end tags are plain pops") {
    assert(bodyHtml("<b><i>x</i></b>y") == "<b><i>x</i></b>y")
  }

  test("AAA: stray formatting end tags are ignored") {
    assert(bodyHtml("a</b></i>b") == "ab")
  }

  test("AAA: Noah's Ark caps identical reconstruction clones at three") {
    val html = "<p><b><b><b><b>x</p>y"
    // four opens, all popped through by </p>; only three reconstruct
    assert(bodyHtml(html) == "<p><b><b><b><b>x</b></b></b></b></p><b><b><b>y</b></b></b>")
  }

  // — adoption agency: html5lib-tests adoption01 classics (expected
  //   trees verified against the WHATWG algorithm's mechanical result;
  //   these exercise the multi-iteration outer loop and the clone
  //   bookkeeping the simple goldens above don't) —

  test("AAA: nested <a> inside a block splits around the block (adoption01 #1)") {
    // outer-loop iteration 2 closes the clone, so Y's <a> is a SIBLING
    // of the X-wrapping clone, not its child
    assert(bodyHtml("<a><p>X<a>Y</a>Z</p></a>") ==
      "<a></a><p><a>X</a><a>Y</a>Z</p>")
  }

  test("AAA: button as furthest block; following text lands in the button") {
    assert(bodyHtml("<b><button>foo</b>bar") ==
      "<b></b><button><b>foo</b>bar</button>")
  }

  test("AAA: interleaved b/i misnest inside a paragraph") {
    assert(bodyHtml("<p>1<b>2<i>3</b>4</i>5</p>") ==
      "<p>1<b>2<i>3</i></b><i>4</i>5</p>")
  }

  test("AAA: italic residue reconstructs across paragraphs and after close") {
    assert(bodyHtml("<i><p>one</i>two<i>three</p>four") ==
      "<i></i><p><i>one</i>two<i>three</i></p><i>four</i>")
  }

  test("AAA: inner-loop node counter drops the 4th formatting element") {
    // walking up from the <div> furthest block: span (not formatting,
    // dropped from the stack), s and u cloned into the chain, em hits
    // the >3 inner counter and is dropped from the list entirely
    assert(bodyHtml("<b><em><u><s><span><div>X</b>Y") ==
      "<b><em><u><s><span></span></s></u></em></b><u><s><div><b>X</b>Y</div></s></u>")
  }

  // — foster parenting —

  test("foster: stray text after a row moves before the table") {
    assert(bodyHtml("<table><tr><td>A</td></tr>stray</table>") ==
      "stray<table><tbody><tr><td>A</td></tr></tbody></table>")
  }

  test("foster: leading text in a table moves before it") {
    assert(bodyHtml("<table>foo<tr><td>bar</td></tr></table>") ==
      "foo<table><tbody><tr><td>bar</td></tr></tbody></table>")
  }

  test("foster: whitespace-only runs stay inside the table") {
    assert(bodyHtml("<table> <tbody><tr><td>x</td></tr></tbody></table>") ==
      "<table> <tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("foster: misplaced elements move before the table") {
    assert(bodyHtml("<div><table><b>bold</b><tr><td>x</td></tr></table></div>") ==
      "<div><b>bold</b><table><tbody><tr><td>x</td></tr></tbody></table></div>")
  }

  test("foster: cell content is never fostered") {
    assert(bodyHtml("<table><tbody><tr><td><b>in cell</b></td></tr></tbody></table>") ==
      "<table><tbody><tr><td><b>in cell</b></td></tr></tbody></table>")
  }

  test("foster: nested <table> closes the open table") {
    assert(bodyHtml("<table><tr><td>a</td></tr><table><tr><td>b</td></tr></table>") ==
      "<table><tbody><tr><td>a</td></tr></tbody></table>" +
      "<table><tbody><tr><td>b</td></tr></tbody></table>")
  }

  test("foster: formatting fostered with reconstruction stays ordered") {
    // <b> fostered before the table; cell content unaffected by it (td marker)
    assert(bodyHtml("<table><b>x<tr><td>y</td></tr></table>z") ==
      "<b>x</b><table><tbody><tr><td>y</td></tr></tbody></table><b>z</b>")
  }

  // — template content —

  test("template: table fragments inside template are not fostered") {
    assert(bodyHtml("<body><template><tr><td>cell</td></tr></template>") ==
      "<template><tr><td>cell</td></tr></template>")
  }

  test("template: content inside a table is not fostered out") {
    assert(bodyHtml("<table><template>inner</template><tbody><tr><td>x</td></tr></tbody></table>") ==
      "<table><template>inner</template><tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("template: formatting marker contains misnesting") {
    assert(bodyHtml("<body><template><b>x</template>y") ==
      "<template><b>x</b></template>y")
  }

  test("template: extract_plain_text skips template content") {
    val txt = Html2Text.extractFromHtml(
      "<body><p>a</p><template><p>hidden</p></template><p>b</p>", Html2Text.Options())
    assert(txt == "a\n\nb")
  }

  test("template: in head stays in head") {
    val t = HtmlTree.parse("<head><template><p>x</p></template></head><body>y")
    assert(t.head.childNodes.map(_.tag) == Vector("template"))
    assert(t.body.text == "y")
  }

  // — template fragment semantics (r11: the observable surface matches
  //   lexbor's separate content fragment, tree.rs:63-89) —

  test("template: selectors never see into template content; the template " +
      "element itself is selectable") {
    val t = HtmlTree.parse(
      "<body><template><p class='x' id='in'>hidden</p></template>" +
        "<p class='x' id='out'>shown</p>")
    assert(t.body.querySelectorAll("p.x").map(_.id) == Vector("out"))
    assert(t.body.querySelectorAll("template").size == 1)
    assert(t.body.getElementsByTagName("p").map(_.id) == Vector("out"))
    assert(t.document.getElementById("in").isEmpty)
    assert(t.body.querySelector("template p").isEmpty) // browser parity
  }

  test("template: Element.text is fragment-scoped (template.text is empty, " +
      "ancestors exclude the content)") {
    val t = HtmlTree.parse("<body>a<template>hidden</template>b")
    assert(t.body.text == "ab")
    val tpl = t.body.querySelector("template").get
    assert(tpl.text == "")
    // the content is still REACHABLE (this engine's `.content` path) and
    // serialization round-trips it like browser innerHTML
    assert(tpl.childNodes.map(_.value) == Vector("hidden"))
    assert(tpl.html == "<template>hidden</template>")
  }

  test("template: iterateSubtree is document-order (stops at the fragment " +
      "boundary, template element included)") {
    val t = HtmlTree.parse("<body><template><p>x</p></template><span>y</span>")
    val tags = t.body.iterateSubtree.filter(_.isElement).map(_.tag).toVector
    assert(tags == Vector("body", "template", "span"))
  }

  // — tokenizer-level spec behaviors (round 8) —

  test("self-closing slash is ignored on HTML elements") {
    // browsers keep <div/> and <span/> OPEN; only void and foreign
    // elements honor the slash
    assert(bodyHtml("<div/>inside</div>after") == "<div>inside</div>after")
    assert(bodyHtml("<span/>x</span>y") == "<span>x</span>y")
    assert(bodyHtml("<br/>z") == "<br>z")
  }

  test("self-closing still honored in foreign (svg) content") {
    val t = HtmlTree.parse("<svg><circle/><rect/></svg>")
    val svg = t.body.firstElementChild
    assert(svg.tag == "svg")
    assert(svg.childNodes.map(_.tag) == Vector("circle", "rect"))
  }

  test("iframe and noembed contents are raw text") {
    val t = HtmlTree.parse("<iframe><p>fallback</p></iframe>")
    val ifr = t.body.firstElementChild
    assert(ifr.tag == "iframe")
    assert(ifr.firstChild != null && ifr.firstChild.isText)
    assert(ifr.firstChild.value == "<p>fallback</p>")
  }

  test("plaintext consumes everything to EOF literally") {
    val t = HtmlTree.parse("<p>before</p><plaintext><b>not bold</b></plaintext>still text")
    val pt = t.body.lastElementChild
    assert(pt.tag == "plaintext")
    assert(pt.firstChild.isText)
    assert(pt.firstChild.value == "<b>not bold</b></plaintext>still text")
  }

  // — regression: trigger-free documents keep the old tree —

  test("well-formed table unchanged") {
    assert(bodyHtml("<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>1</td></tr></tbody></table>") ==
      "<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>1</td></tr></tbody></table>")
  }

  test("unclosed formatting at EOF just unwinds") {
    assert(bodyHtml("<p>unclosed <b>bold <i>italic") ==
      "<p>unclosed <b>bold <i>italic</i></b></p>")
  }

  // — implicit table sections (in-table insertion modes) —

  test("tbody synthesis: <table><tr> gets a tbody") {
    assert(bodyHtml("<table><tr><td>x</td></tr></table>") ==
      "<table><tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("tbody+tr synthesis: <table><td> gets both") {
    assert(bodyHtml("<table><td>x</table>") ==
      "<table><tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("tr synthesis: <table><tbody><td> gets a tr") {
    assert(bodyHtml("<table><tbody><td>x</table>") ==
      "<table><tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("colgroup synthesis: <table><col> gets a colgroup; cols share it") {
    assert(bodyHtml("<table><col><col><tr><td>x</td></tr></table>") ==
      "<table><colgroup><col><col></colgroup><tbody><tr><td>x</td></tr></tbody></table>")
  }

  test("explicit thead is not re-wrapped; sibling tr after it opens tbody") {
    assert(bodyHtml("<table><thead><tr><th>h</th></tr></thead><tr><td>x</td></tr></table>") ==
      "<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>x</td></tr></tbody></table>")
  }

  // — button scope —

  test("button scope: a p behind a button stays open across a div") {
    // div start must NOT close the p (button is a scope barrier), so the
    // div nests inside the button inside the p
    assert(bodyHtml("<p>a<button>b<div>c</div></button>d</p>") ==
      "<p>a<button>b<div>c</div></button>d</p>")
  }

  test("button scope: p inside a cell invisible to blocks outside it") {
    assert(bodyHtml("<table><tr><td><p>cell</td></tr></table><div>after</div>") ==
      "<table><tbody><tr><td><p>cell</p></td></tr></tbody></table><div>after</div>")
  }

  test("p still closes across non-barrier ancestors") {
    assert(bodyHtml("<p>one<p>two") == "<p>one</p><p>two</p>")
  }

  // — list-item scope (the li/dd/dt walk) —

  test("li closes a prior li through an intervening div") {
    assert(bodyHtml("<ul><li>a<div>b<li>c</ul>") ==
      "<ul><li>a<div>b</div></li><li>c</li></ul>")
  }

  test("li does not close through a special barrier (nested ul keeps nesting)") {
    assert(bodyHtml("<ul><li>a<ul><li>b</ul></li></ul>") ==
      "<ul><li>a<ul><li>b</li></ul></li></ul>")
  }

  test("li closes an open p in button scope") {
    assert(bodyHtml("<ul><li><p>para<li>next</ul>") ==
      "<ul><li><p>para</p></li><li>next</li></ul>")
  }

  test("dd/dt close each other through a div but not address content") {
    assert(bodyHtml("<dl><dt>t<div>x<dd>d</dl>") ==
      "<dl><dt>t<div>x</div></dt><dd>d</dd></dl>")
  }

  // — table scope for table-family end tags —

  test("</td> inside a nested table does not pop out of it") {
    assert(bodyHtml("<table><tr><td><table><tr><td>in</td></td></tr></table>x</td></tr></table>") ==
      "<table><tbody><tr><td><table><tbody><tr><td>in</td></td></tr></tbody></table>x</td></tr></tbody></table>"
        .replace("</td></td>", "</td>")) // inner stray </td> is ignored
  }

  test("</table> inside a template does not close an outer table") {
    assert(bodyHtml("<table><template></table>x</template><tr><td>y</td></tr></table>") ==
      "<table><template>x</template><tbody><tr><td>y</td></tr></tbody></table>")
  }

  // — end-tag rules: named clauses, any-other-end-tag, </p>, </br> —

  test("any other end tag: a special element between ignores the token") {
    // </span> with an open div above the span is ignored (browser
    // behavior) — x lands inside the div, which stays inside the span
    assert(bodyHtml("<span><div></span>x</div>y") ==
      "<span><div>x</div>y</span>")
  }

  test("named-clause end tag still closes through non-special content") {
    assert(bodyHtml("<ul><li>one<li>two</ul>after") ==
      "<ul><li>one</li><li>two</li></ul>after")
  }

  test("</div> pops an open p (implied end); a stray </p> synthesizes " +
      "an empty p, per spec") {
    assert(bodyHtml("<div><p>a</div>b") == "<div><p>a</p></div>b")
    // no p in button scope at </p>: the spec inserts an empty p element
    // and closes it (browser tree)
    assert(bodyHtml("<p><div>a</p>b</div>") == "<p></p><div>a<p></p>b</div>")
    assert(bodyHtml("x</p>y") == "x<p></p>y")
  }

  test("</p> with the p behind a button barrier synthesizes an empty p " +
      "inside the button (the outer p stays open)") {
    assert(bodyHtml("<p>a<button>b</p>c</button>d") ==
      "<p>a<button>b<p></p>c</button>d</p>")
  }

  test("</br> acts as a br start tag") {
    assert(bodyHtml("a</br>b") == "a<br>b")
  }

  test("</h2> closes an open h3 (any-heading rule)") {
    assert(bodyHtml("<h3>title</h2>rest") == "<h3>title</h3>rest")
  }

  test("</form> removes the form from the stack without closing what's " +
      "above it") {
    // browsers keep `more` inside the still-open div (the form element
    // is removed from the open stack, not popped through)
    assert(bodyHtml("<form><div>x</form>more</div>after") ==
      "<form><div>xmore</div></form>after")
    // at the top of the stack it reduces to a plain close
    assert(bodyHtml("<form><input>x</form>y") == "<form><input>x</form>y")
  }

  test("</li> outside list-item scope is ignored") {
    // the ul barrier hides the OUTER li; with no li inside the inner
    // list yet, the stray </li> is ignored instead of popping the ul
    assert(bodyHtml("<ul><li>a<ul></li><li>b</ul></li></ul>") ==
      "<ul><li>a<ul><li>b</li></ul></li></ul>")
  }
}
