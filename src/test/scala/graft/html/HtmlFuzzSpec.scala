package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential fuzzing of the two extraction walks: for
  * thousands of generated tag soups — biased toward the hard cases
  * (tables, formatting misnests, templates, raw text, self-closing,
  * depth) — `Html2TextStream.extract` (streaming with DOM fallback on
  * tree-rule triggers) must be byte-identical to the DOM walk, and the
  * parser must never throw. Deterministic seed so failures reproduce;
  * the failing input is printed whole for minimization.
  */
class HtmlFuzzSpec extends AnyFunSuite {

  private val startTags = Array(
    "div", "p", "span", "b", "i", "em", "a", "u", "s", "small", "nobr",
    "table", "tr", "td", "th", "tbody", "thead", "caption", "colgroup",
    "ul", "ol", "li", "dl", "dt", "dd", "h1", "h2", "pre", "blockquote",
    "template", "form", "input", "img", "br", "hr", "center", "font",
    "script", "style", "title", "textarea", "svg", "iframe", "select",
    "option", "button", "section", "article", "listing", "big", "tt")

  private val texts = Array(
    "hello", " ", "x y z", "&amp; &lt;ok&gt;", "  \n\t ", "1",
    "long text with several words in it", "&#65;&#x42;", "¶", "mixed &notanentity")

  private def gen(rnd: java.util.Random, maxTok: Int): String = {
    val sb = new StringBuilder
    val open = collection.mutable.ArrayBuffer.empty[String]
    val n = 2 + rnd.nextInt(maxTok)
    for (_ <- 0 until n) rnd.nextInt(10) match {
      case 0 | 1 | 2 =>
        sb.append(texts(rnd.nextInt(texts.length)))
      case 3 | 4 | 5 | 6 =>
        val t = startTags(rnd.nextInt(startTags.length))
        sb.append('<').append(t)
        if (rnd.nextInt(4) == 0) sb.append(" class=\"c").append(rnd.nextInt(3)).append('"')
        if (rnd.nextInt(8) == 0) sb.append('/')
        sb.append('>')
        open += t
        // raw-text elements swallow everything to their end tag: close
        // half of them immediately so the fuzz keeps generating markup
        if (HtmlParser.RawText.contains(t) || HtmlParser.RcData.contains(t)) {
          sb.append(texts(rnd.nextInt(texts.length)))
          if (rnd.nextBoolean()) sb.append("</").append(t).append('>')
        }
      case 7 | 8 =>
        // end tag: usually something that is open (possibly misnested),
        // sometimes a stray
        val t = if (open.nonEmpty && rnd.nextInt(5) > 0)
          open(rnd.nextInt(open.size))
        else startTags(rnd.nextInt(startTags.length))
        sb.append("</").append(t).append('>')
      case 9 =>
        rnd.nextInt(4) match {
          case 0 => sb.append("<!-- c -->")
          case 1 => sb.append("<!doctype html>")
          case 2 => sb.append("<") // stray angle
          case _ => sb.append("</") // truncated end tag
        }
    }
    sb.toString
  }

  private val optionSets = Seq(
    Html2Text.Options(),
    Html2Text.Options(formatting = Html2Text.FormatOff),
    Html2Text.Options(links = true, formFields = true),
    Html2Text.Options(altTexts = false, listBullets = false),
  )

  test("stream and DOM walks agree on 4000 random soups x 4 option sets") {
    val rnd = new java.util.Random(0xabc123)
    for (iter <- 0 until 4000) {
      val html = gen(rnd, if (iter % 10 == 0) 120 else 30)
      optionSets.foreach { o =>
        val dom =
          try Html2Text.extract(HtmlTree.parse(html), o)
          catch { case e: Throwable => fail(s"DOM path threw ${e.getClass.getSimpleName} on:\n$html") }
        val streamed =
          try Html2TextStream.extract(html, o)
          catch { case e: Throwable => fail(s"stream path threw ${e.getClass.getSimpleName} on:\n$html") }
        assert(streamed == dom,
          s"iter $iter opts=$o\n--IN--\n$html\n--DOM--\n$dom\n--STREAM--\n$streamed")
      }
    }
  }

  test("parser never throws and serialization round-trips on deep random soups") {
    val rnd = new java.util.Random(0xbeef2)
    for (_ <- 0 until 500) {
      val html = gen(rnd, 200)
      val tree = HtmlTree.parse(html)
      // the serialized tree must itself reparse without throwing
      HtmlTree.parse(tree.document.html)
    }
  }
}

/** Test-scope bridge so dev tools (FuzzLong) reuse the generator. */
class HtmlFuzzAccess {
  private val spec = new HtmlFuzzSpec
  def gen(rnd: java.util.Random, maxTok: Int): String = {
    val m = classOf[HtmlFuzzSpec].getDeclaredMethod(
      "gen", classOf[java.util.Random], classOf[Int])
    m.setAccessible(true)
    m.invoke(spec, rnd, Integer.valueOf(maxTok)).asInstanceOf[String]
  }
}
