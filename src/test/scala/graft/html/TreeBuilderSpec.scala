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
    assert(bodyHtml("<td><b>x</td>y") == "<td><b>x</b></td>y")
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
      "stray<table><tr><td>A</td></tr></table>")
  }

  test("foster: leading text in a table moves before it") {
    assert(bodyHtml("<table>foo<tr><td>bar</td></tr></table>") ==
      "foo<table><tr><td>bar</td></tr></table>")
  }

  test("foster: whitespace-only runs stay inside the table") {
    assert(bodyHtml("<table> <tr><td>x</td></tr></table>") ==
      "<table> <tr><td>x</td></tr></table>")
  }

  test("foster: misplaced elements move before the table") {
    assert(bodyHtml("<div><table><b>bold</b><tr><td>x</td></tr></table></div>") ==
      "<div><b>bold</b><table><tr><td>x</td></tr></table></div>")
  }

  test("foster: cell content is never fostered") {
    assert(bodyHtml("<table><tr><td><b>in cell</b></td></tr></table>") ==
      "<table><tr><td><b>in cell</b></td></tr></table>")
  }

  test("foster: nested <table> closes the open table") {
    assert(bodyHtml("<table><tr><td>a</td></tr><table><tr><td>b</td></tr></table>") ==
      "<table><tr><td>a</td></tr></table><table><tr><td>b</td></tr></table>")
  }

  test("foster: formatting fostered with reconstruction stays ordered") {
    // <b> fostered before the table; cell content unaffected by it (td marker)
    assert(bodyHtml("<table><b>x<tr><td>y</td></tr></table>z") ==
      "<b>x</b><table><tr><td>y</td></tr></table><b>z</b>")
  }

  // — template content —

  test("template: table fragments inside template are not fostered") {
    assert(bodyHtml("<body><template><tr><td>cell</td></tr></template>") ==
      "<template><tr><td>cell</td></tr></template>")
  }

  test("template: content inside a table is not fostered out") {
    assert(bodyHtml("<table><template>inner</template><tr><td>x</td></tr></table>") ==
      "<table><template>inner</template><tr><td>x</td></tr></table>")
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
}
