package graft.html

import scala.collection.mutable

/** CSS selector subset engine — everything the reference's own pipelines
  * and tests use (selector strings at html2text.pyx:806-815,879-882;
  * tests/resiliparse/parse/test_html.py:140-221):
  * tag, `*`, `#id`, `.class`, `[attr]`, `[attr=v]` (also ~= ^= $= *=),
  * `:first-child` / `:last-child` / `:nth-child(n)`, compound selectors,
  * descendant / child / adjacent / general-sibling combinators, and
  * comma groups. Invalid selectors throw IllegalArgumentException
  * (the reference raises ValueError, html.pyx:1091).
  */
object CssSelector {

  sealed trait Simple
  case class Tag(name: String) extends Simple
  case object Universal extends Simple
  case class Id(id: String) extends Simple
  case class Cls(cls: String) extends Simple
  case class Attr(name: String, op: Option[String], value: Option[String]) extends Simple
  case class Pseudo(name: String, arg: Option[String]) extends Simple

  /** One compound selector (e.g. `p.foo[bar=baz]`). */
  case class Compound(simples: Seq[Simple]) {
    // array form: element-match runs per DOM node per selector — keep the
    // inner loop free of Seq iterators and closures
    private[this] val arr: Array[Simple] = simples.toArray

    def matches(n: DomNode): Boolean = {
      if (!n.isElement) return false
      var i = 0
      while (i < arr.length) {
        if (!matchSimple(arr(i), n)) return false
        i += 1
      }
      true
    }

    private def matchSimple(s: Simple, n: DomNode): Boolean = s match {
      case Tag(t) => n.tag == t
      case Universal => true
      case Id(v) => n.getattr("id").contains(v)
      case Cls(v) => n.hasClassToken(v)
      case Attr(name, None, _) => n.hasattr(name)
      case Attr(name, Some(op), Some(v)) =>
        n.getattr(name).exists { av =>
          op match {
            case "=" => av == v
            case "~=" => DomNode.hasToken(av, v)
            case "^=" => v.nonEmpty && av.startsWith(v)
            case "$=" => v.nonEmpty && av.endsWith(v)
            case "*=" => v.nonEmpty && av.contains(v)
            case "|=" => av == v || av.startsWith(v + "-")
            case _ => false
          }
        }
      case Attr(_, Some(_), None) => false
      case Pseudo("first-child", _) => prevElementSibling(n) == null
      case Pseudo("last-child", _) => nextElementSibling(n) == null
      case Pseudo("nth-child", Some(arg)) => nthChildMatches(n, arg)
      case Pseudo(_, _) => false // unsupported pseudo never matches
    }
  }

  private def prevElementSibling(n: DomNode): DomNode = n.prevElement
  private def nextElementSibling(n: DomNode): DomNode = n.nextElement

  private def nthChildMatches(n: DomNode, arg: String): Boolean = {
    var idx = 1
    var p = n.prevElement
    while (p != null) { idx += 1; p = p.prevElement }
    arg.trim.toLowerCase match {
      case "odd" => idx % 2 == 1
      case "even" => idx % 2 == 0
      case a if a.forall(_.isDigit) && a.nonEmpty => idx == a.toInt
      case a =>
        // an+b
        val m = """^(-?\d*)n\s*([+-]\s*\d+)?$""".r.findFirstMatchIn(a)
        m.exists { mm =>
          val aCoef = mm.group(1) match {
            case "" => 1; case "-" => -1; case s => s.toInt
          }
          val b = Option(mm.group(2)).map(_.replaceAll("\\s", "").toInt).getOrElse(0)
          if (aCoef == 0) idx == b
          else { val k = idx - b; k % aCoef == 0 && k / aCoef >= 0 }
        }
    }
  }

  /** chain of (combinator, compound); combinator applies between the
    * previous compound and this one: ' ' descendant, '>' child,
    * '+' adjacent, '~' general sibling.
    */
  case class Chain(parts: Seq[(Char, Compound)]) {
    /** Match `n` against the full chain (rightmost compound on `n`). */
    def matches(n: DomNode): Boolean = matchFrom(n, parts.length - 1)

    private def matchFrom(n: DomNode, i: Int): Boolean = {
      if (!parts(i)._2.matches(n)) return false
      if (i == 0) return true
      val comb = parts(i)._1
      comb match {
        case '>' => n.parent != null && matchFrom(n.parent, i - 1)
        case '+' =>
          val p = n.prevElement
          p != null && matchFrom(p, i - 1)
        case '~' =>
          var p = n.prevElement
          while (p != null) { if (matchFrom(p, i - 1)) return true; p = p.prevElement }
          false
        case _ => // descendant
          var p = n.parent
          while (p != null) { if (matchFrom(p, i - 1)) return true; p = p.parent }
          false
      }
    }
  }

  case class Group(chains: Seq[Chain]) {
    // Pure-tag-name groups (e.g. the html2text skip list: "script, style,
    // iframe, ...") reduce to one hash lookup per node instead of
    // per-chain structural matching.
    private[this] val tagOnly: java.util.HashSet[String] = {
      val all = chains.forall(c => c.parts.length == 1 && (c.parts.head._2.simples match {
        case Seq(Tag(_)) => true
        case _ => false
      }))
      if (!all) null
      else {
        val s = new java.util.HashSet[String]()
        chains.foreach(c => s.add(c.parts.head._2.simples.head.asInstanceOf[Tag].name))
        s
      }
    }

    @inline private def anyMatch(n: DomNode): Boolean =
      if (tagOnly != null) tagOnly.contains(n.tag)
      else {
        var i = 0
        var hit = false
        while (!hit && i < chains.length) { hit = chains(i).matches(n); i += 1 }
        hit
      }

    /** Whether `n` itself matches any chain of the group
      * (`Element.matches` / `closest` support).
      */
    def matchesNode(n: DomNode): Boolean = n.isElement && anyMatch(n)

    /** All STRICT-descendant elements of root matching any chain, in
      * document order, deduplicated.
      */
    def allMatches(root: DomNode): Vector[DomNode] = {
      val out = Vector.newBuilder[DomNode]
      // document-tree walk: template content is fragment-scoped, so
      // selectors never see inside a template (lexbor/browser parity)
      DomTraversal.preOrderDocument(root) { n =>
        if ((n ne root) && n.isElement && anyMatch(n)) out += n
        true
      }
      out.result()
    }

    def firstMatch(root: DomNode): Option[DomNode] = {
      var found: DomNode = null
      DomTraversal.preOrderDocument(root) { n =>
        if (found == null && (n ne root) && n.isElement && anyMatch(n))
          found = n
        found == null // stop descending once found
      }
      Option(found)
    }
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Group]()

  def parse(selector: String): Group = {
    val cached = cache.get(selector)
    if (cached != null) return cached
    val g = parseImpl(selector)
    if (cache.size < 4096) cache.put(selector, g)
    g
  }

  private def parseImpl(selector: String): Group = {
    val chains = selector.split(',').map(_.trim)
    if (chains.isEmpty || chains.exists(_.isEmpty))
      throw new IllegalArgumentException(s"invalid CSS selector: '$selector'")
    Group(chains.toIndexedSeq.map(parseChain))
  }

  private def parseChain(s: String): Chain = {
    val parts = mutable.ArrayBuffer.empty[(Char, Compound)]
    var i = 0
    val n = s.length
    var combinator = ' '
    while (i < n) {
      // skip whitespace, detect explicit combinators
      var sawSpace = false
      while (i < n && (s.charAt(i).isWhitespace || s.charAt(i) == '>' ||
             s.charAt(i) == '+' || s.charAt(i) == '~')) {
        val c = s.charAt(i)
        if (c == '>' || c == '+' || c == '~') combinator = c
        else sawSpace = true
        i += 1
      }
      if (i >= n) {
        if (parts.isEmpty || combinator != ' ' )
          throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
        return Chain(parts.toSeq)
      }
      if (parts.isEmpty) combinator = ' '
      else if (combinator == ' ' && !sawSpace)
        throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
      val (compound, after) = parseCompound(s, i)
      parts += (combinator -> compound)
      combinator = ' '
      i = after
    }
    if (parts.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
    Chain(parts.toSeq)
  }

  private def parseCompound(s: String, from: Int): (Compound, Int) = {
    val simples = mutable.ArrayBuffer.empty[Simple]
    var i = from
    val n = s.length
    def ident(start: Int): (String, Int) = {
      var j = start
      while (j < n && (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '-' ||
             s.charAt(j) == '_' || s.charAt(j) == '\\')) j += 1
      (s.substring(start, j).replace("\\", ""), j)
    }
    var done = false
    while (i < n && !done) {
      s.charAt(i) match {
        case c if c.isWhitespace || c == '>' || c == '+' || c == '~' || c == ',' =>
          done = true
        case '*' => simples += Universal; i += 1
        case '#' =>
          val (name, j) = ident(i + 1)
          if (name.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
          simples += Id(name); i = j
        case '.' =>
          val (name, j) = ident(i + 1)
          if (name.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
          simples += Cls(name); i = j
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
          val inner = s.substring(i + 1, close).trim
          val opIdx = inner.indexWhere(c => c == '=' || c == '~' || c == '^' ||
            c == '$' || c == '*' || c == '|')
          if (opIdx < 0) simples += Attr(inner.toLowerCase, None, None)
          else {
            val name = inner.substring(0, opIdx).trim.toLowerCase
            val op = if (inner.charAt(opIdx) == '=') "="
                     else inner.charAt(opIdx).toString + "="
            val rawV = inner.substring(inner.indexOf('=', opIdx) + 1).trim
            val v = if (rawV.length >= 2 && (rawV.head == '"' || rawV.head == '\'') &&
                        rawV.last == rawV.head) rawV.substring(1, rawV.length - 1)
                    else rawV
            if (name.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
            simples += Attr(name, Some(op), Some(v))
          }
          i = close + 1
        case ':' =>
          var j = i + 1
          while (j < n && s.charAt(j) == ':') j += 1 // ::before → before
          val (name, k) = ident(j)
          if (name.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
          if (k < n && s.charAt(k) == '(') {
            val close = s.indexOf(')', k)
            if (close < 0) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
            simples += Pseudo(name.toLowerCase, Some(s.substring(k + 1, close)))
            i = close + 1
          } else {
            simples += Pseudo(name.toLowerCase, None)
            i = k
          }
        case c if Character.isLetter(c) =>
          val (name, j) = ident(i)
          simples += Tag(name.toLowerCase); i = j
        case _ =>
          throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
      }
    }
    if (simples.isEmpty) throw new IllegalArgumentException(s"invalid CSS selector: '$s'")
    (Compound(simples.toSeq), i)
  }
}
