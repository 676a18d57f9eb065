package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Extraction FROM a skip-listed element: the blacklist applies to
  * strict descendants only (the old querySelectorAll semantics), so
  * extract(figure, ...) returns the figure's own text even though
  * `figure` sits in the default altTexts=false skip set.
  */
class Html2TextRootSpec extends AnyFunSuite {
  test("skip-listed root still extracts its own subtree") {
    val tree = HtmlTree.parse(
      "<html><body><figure><figcaption>cap</figcaption>body text</figure></body></html>")
    val fig = tree.body.querySelectorAll("figure").head
    val opts = Html2Text.Options(altTexts = false) // skip set includes figure/figcaption
    val out = Html2Text.extract(fig, opts)
    assert(out.contains("body text"), s"got: '$out'")
    // nested skip entries still skip: figcaption is a strict descendant
    assert(!out.contains("cap"), s"got: '$out'")
  }

  test("nested occurrence of the root's tag still skips") {
    val tree = HtmlTree.parse(
      "<html><body><figure>outer<figure>inner</figure></figure></body></html>")
    val fig = tree.body.querySelectorAll("figure").head
    val out = Html2Text.extract(fig, Html2Text.Options(altTexts = false))
    assert(out.contains("outer") && !out.contains("inner"), s"got: '$out'")
  }
}
