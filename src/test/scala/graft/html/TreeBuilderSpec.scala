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
