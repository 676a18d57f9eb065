package graft.html

import scala.collection.mutable

/** DOM-free `extract_plain_text`: the tokenizer drives
  * [[Html2Text.extractCb]] directly, so full-page extraction never
  * materializes a DOM — the dominant allocation source on the hot path
  * (per-node objects + per-text substrings), and the reason parallel
  * extraction was memory-bandwidth-bound.
  *
  * Event order and depths replicate what [[HtmlParser.parse]] +
  * [[Html2Text.extract]]'s pre-order walk produce for the SAME input —
  * the two paths share the tag tables, the extraction callback, and the
  * serializer, and `Html2TextStreamSpec` diffs them over every fixture
  * page, golden input and option combination. Walk semantics mirrored:
  *  - only body content is visited (head-phase content is suppressed
  *    exactly as the parser routes it to head);
  *  - skip-list subtrees produce no events and no end visits;
  *  - end visits fire only for elements that acquired a child (text,
  *    element or comment), innermost-first on every pop (explicit end
  *    tags, implicit closes, body reset, EOF unwind);
  *  - depth = 1 + open-element count below body, as in the DOM walk.
  *
  * Only valid for option sets the streaming walk can express:
  * no main-content classification (needs ancestry + subtree stats), no
  * minimal-HTML (serializer consults the DOM), tag-name-only skip lists.
  * [[eligible]] gates dispatch; callers fall back to the DOM path.
  *
  * INPUT bail-outs: the DOM parser's adoption-agency / foster-parenting
  * rules can reorder or restructure the tree in ways a single forward
  * pass cannot replicate (fostered text moves BEFORE the table; popped
  * formatting elements re-open as clones). The walk detects exactly the
  * trigger conditions under which the DOM tree diverges from the shared
  * streaming model — a foster event, a misnested formatting end tag, a
  * nested table, a pop-through that leaves active-formatting residue —
  * and restarts on the DOM path ([[Bail]]). Trigger-free documents (the
  * overwhelming majority) keep the allocation-free fast path.
  */
object Html2TextStream {

  import Html2Text.{ExtractNode, Options}
  import HtmlParser._

  def eligible(opts: Options): Boolean =
    !opts.mainContent &&
      opts.formatting != Html2Text.FormatMinimalHtml &&
      opts.skipElements.forall(_.matches("[a-zA-Z][a-zA-Z0-9-]*"))

  /** Control-flow signal: this input needs the DOM parser's tree rules. */
  private object Bail extends scala.util.control.ControlThrowable

  /** Mutable view handed to the shared extraction callback. Text values
    * arrive either as a String (entity-decoded runs) or as an input
    * slice [fromV, toV) — the slice mode lets [[NodeView.appendValueTo]]
    * copy straight from the input into the node's text buffer, skipping
    * the per-run intermediate String that dominated text allocation.
    */
  private final class EvView extends NodeView {
    var isTextV = false
    var tagV = ""
    var flagsV = 0
    override private[html] def tagFlags: Int = flagsV
    var valueV: String = _
    var attrsV: collection.Seq[(String, String)] = Nil
    var srcV: String = _
    var sliceV = false
    var fromV = 0
    var toV = 0
    def isText: Boolean = isTextV
    def isElement: Boolean = !isTextV
    def tag: String = tagV
    def value: String = if (sliceV) srcV.substring(fromV, toV) else valueV
    override def appendValueTo(sb: StringBuilder): Unit =
      if (sliceV) {
        // a multi-MB single text run is one loop iteration — give the
        // allocation guard a cancellation point before the big copy
        if (toV - fromV > (1 << 20)) graft.core.MemGuard.poll()
        sb.underlying.append(srcV, fromV, toV)
      } else if (valueV != null) sb.append(valueV)
    def getattr(name: String): Option[String] = {
      val k = name.toLowerCase
      var i = 0
      while (i < attrsV.length) {
        val kv = attrsV(i)
        if (kv._1 == k) return Some(kv._2)
        i += 1
      }
      None
    }
    def domOrNull: DomNode = null
  }

  private final class Open(
      val tag: String,
      val flags: Int, // TagFlags bitmask, resolved once at push
      val depth: Int,
      val attrs: collection.Seq[(String, String)],
      val visited: Boolean) { // start visit emitted (not suppressed/skipped)
    var hadChild = false
    // btnBarrierOpen value recorded at push: lets the button-scope test
    // "any scope-barrier element above the last <p>?" run in O(1)
    // instead of allocating stack.drop(pIdx + 1) per block tag
    var btnBarrierAtPush = 0
  }

  private val NoAttrs: mutable.ArrayBuffer[(String, String)] =
    mutable.ArrayBuffer.empty // never mutated; the shared empty-attrs row

  /** Streaming extraction with automatic DOM fallback on tree-rule
    * triggers — output is byte-identical to the DOM path either way.
    */
  def extract(input: String, opts: Options): String =
    try extractStreaming(input, opts)
    catch {
      case Bail => Html2Text.extract(HtmlTree.parse(input, opts.maxNodes), opts)
    }

  /** The pure streaming walk; throws [[Bail]] when the input needs the
    * DOM parser's adoption-agency / foster-parenting restructuring.
    * Package-visible so the differential spec can assert which inputs
    * genuinely stream.
    */
  private[html] def extractStreaming(input: String, opts: Options): String = {
    val skip = mutable.Set("script", "style", "iframe", "frame", "template")
    skip ++= opts.skipElements.map(_.toLowerCase)
    if (!opts.altTexts) skip ++= Seq("object", "video", "audio", "embed", "img",
      "area", "svg", "figcaption", "figure")
    if (!opts.noscript) skip += "noscript"
    if (!opts.formFields) skip ++= Seq("textarea", "input", "button", "select",
      "option", "label")

    // the only tags whose attributes the extraction callback reads under
    // this option set (extractCb: a@href if links, img/area@alt if
    // altTexts, input@type/value/placeholder if formFields)
    val needAttrs: Set[String] = {
      val b = Set.newBuilder[String]
      if (opts.links) b += "a"
      if (opts.altTexts) { b += "img"; b += "area" }
      if (opts.formFields) b += "input"
      b.result()
    }

    val nodes = mutable.ArrayBuffer.empty[ExtractNode]
    val ev = new EvView
    ev.srcV = input

    /** Entity-reference probe BOUNDED to [s, e). `input.indexOf('&', s)`
      * here was quadratic: on a reference-free document every text run
      * re-scanned the whole remaining input (a 1M-row table bomb took
      * ~18 min; any large &-less page paid the same shape).
      */
    def ampIn(s: Int, e: Int): Boolean = {
      var k = s
      while (k < e) {
        if (input.charAt(k) == '&') return true
        k += 1
      }
      false
    }

    def emitText(text: String, depth: Int): Unit = {
      ev.isTextV = true
      ev.tagV = ""
      ev.flagsV = 0
      ev.valueV = text
      ev.sliceV = false
      ev.attrsV = Nil
      Html2Text.extractCb(nodes, ev, depth, isEndTag = false, opts)
    }
    def emitTextSlice(s: Int, e: Int, depth: Int): Unit = {
      ev.isTextV = true
      ev.tagV = ""
      ev.flagsV = 0
      ev.valueV = null
      ev.sliceV = true
      ev.fromV = s
      ev.toV = e
      ev.attrsV = Nil
      Html2Text.extractCb(nodes, ev, depth, isEndTag = false, opts)
      ev.sliceV = false
    }
    def emitTag(tag: String, flags: Int, attrs: collection.Seq[(String, String)], depth: Int,
        isEnd: Boolean): Unit = {
      ev.isTextV = false
      ev.tagV = tag
      ev.flagsV = flags
      ev.valueV = null
      ev.attrsV = attrs
      Html2Text.extractCb(nodes, ev, depth, isEnd, opts)
    }

    var inBody = false
    var bodyHadChild = false
    val stack = mutable.ArrayBuffer.empty[Open]
    // O(1) divergence-trigger state, maintained on every push/pop. The
    // round-8 profile showed the per-tag stack scans these replace
    // (foreign-content exists(), open-<a> exists(), the ClosesP
    // drop().exists() allocation, fosterActive's lastIndexWhere) as the
    // dominant walk overhead on deep real-world pages.
    var foreignDepth = 0   // open svg/math elements
    var aOpen = 0          // open <a>
    var nobrOpen = 0       // open <nobr>
    var formattingOpen = 0 // open formatting-category elements
    var btnBarrierOpen = 0 // open button-scope-barrier elements
    val pIdxStack = mutable.ArrayBuffer.empty[Int]        // stack indices of open <p>
    val tableIdxStack = mutable.ArrayBuffer.empty[Int]    // ... of open <table>
    val templateIdxStack = mutable.ArrayBuffer.empty[Int] // ... of open <template>
    // the DOM walk visits the body root first, unconditionally
    emitTag("body", TagFlags("body"), Nil, 0, isEnd = false)

    def markChild(): Unit =
      if (stack.nonEmpty) stack.last.hadChild = true else bodyHadChild = true

    /** Whether events from the current position are suppressed (inside a
      * skipped subtree, or still in the head).
      */
    def suppressed: Boolean =
      (!inBody && stack.isEmpty) || (stack.nonEmpty && !stack.last.visited)

    def switchToBody(): Unit = if (!inBody) { popAll(); inBody = true }

    /** Record a just-pushed element (at stack index `idx`, already
      * appended) in the trigger-state counters.
      */
    def trackPush(o: Open, idx: Int): Unit = {
      val t = o.tag
      if ((o.flags & TagFlags.ForeignRootF) != 0) foreignDepth += 1
      if ((o.flags & TagFlags.FormattingF) != 0) {
        formattingOpen += 1
        if (t == "a") aOpen += 1 else if (t == "nobr") nobrOpen += 1
      }
      if ((o.flags & TagFlags.ScopeBarrierF) != 0 || t == "button") btnBarrierOpen += 1
      o.btnBarrierAtPush = btnBarrierOpen
      if (t == "p") pIdxStack += idx
      else if (t == "table") tableIdxStack += idx
      else if (t == "template") templateIdxStack += idx
    }

    /** Pop the top element, firing its end visit when the DOM walk would
      * (start was emitted and it acquired a child).
      */
    def popOne(): Unit = {
      val idx = stack.size - 1
      val o = stack.remove(idx)
      val t = o.tag
      if ((o.flags & TagFlags.ForeignRootF) != 0) foreignDepth -= 1
      if ((o.flags & TagFlags.FormattingF) != 0) {
        formattingOpen -= 1
        if (t == "a") aOpen -= 1 else if (t == "nobr") nobrOpen -= 1
      }
      if ((o.flags & TagFlags.ScopeBarrierF) != 0 || t == "button") btnBarrierOpen -= 1
      if (t == "p") pIdxStack.remove(pIdxStack.size - 1)
      else if (t == "table") tableIdxStack.remove(tableIdxStack.size - 1)
      else if (t == "template") templateIdxStack.remove(templateIdxStack.size - 1)
      if (o.visited && o.hadChild) emitTag(o.tag, o.flags, o.attrs, o.depth, isEnd = true)
    }
    def popAll(): Unit = while (stack.nonEmpty) popOne()

    // — DOM-divergence triggers (see class scaladoc) —

    /** The DOM parser would foster-parent an insertion here: a table is
      * open with no template inside it (mirrors HtmlParser.fosterNeeded).
      * O(1): a template "inside" the current table is exactly a template
      * whose stack index is above the last table's.
      */
    def fosterActive: Boolean =
      tableIdxStack.nonEmpty &&
        (templateIdxStack.isEmpty || templateIdxStack.last < tableIdxStack.last)

    def parentTableCtx: Boolean =
      stack.nonEmpty && (stack.last.flags & TagFlags.TableCtxF) != 0

    /** Popping [idx, top] would leave a formatting element in the DOM
      * parser's active-formatting list (residue → later reconstruction):
      * a formatting element with no marker element below it in the range.
      * With no formatting element open anywhere the scan is skipped.
      */
    def bailOnResidue(idx: Int): Unit = {
      if (formattingOpen == 0) return
      var k = idx
      var seenMarker = false
      while (k < stack.size) {
        val f = stack(k).flags
        if (!seenMarker && (f & TagFlags.FormattingF) != 0) throw Bail
        if ((f & TagFlags.MarkerF) != 0) seenMarker = true
        k += 1
      }
    }

    def insertText(raw0: String, decodeEntities: Boolean): Unit = {
      var raw = raw0
      if (raw.isEmpty) return
      if (!inBody && stack.isEmpty) {
        if (allWs(raw)) return
        switchToBody()
      }
      // single newline after a pre/textarea/listing start tag is dropped
      if (stack.nonEmpty && !stack.last.hadChild &&
          (stack.last.tag == "pre" || stack.last.tag == "textarea" ||
           stack.last.tag == "listing")) {
        if (raw.startsWith("\r\n")) raw = raw.substring(2)
        else if (raw.startsWith("\n") || raw.startsWith("\r")) raw = raw.substring(1)
        if (raw.isEmpty) return
      }
      // non-whitespace text directly in table structure gets fostered
      // BEFORE the table by the DOM parser — unstreamable reordering
      if (parentTableCtx && !allWs(raw) && fosterActive) throw Bail
      val wasSuppressed = suppressed
      markChild()
      if (!wasSuppressed)
        emitText(if (decodeEntities) Entities.decode(raw) else raw,
          stack.size + 1)
    }

    /** [[insertText]] over the input slice [s0, e) — identical semantics,
      * no substring unless the run needs entity decoding.
      */
    def insertTextSlice(s0: Int, e: Int): Unit = {
      var s = s0
      if (s >= e) return
      if (!inBody && stack.isEmpty) {
        var k = s
        while (k < e && HtmlParser.isWs(input.charAt(k))) k += 1
        if (k == e) return
        switchToBody()
      }
      if (stack.nonEmpty && !stack.last.hadChild &&
          (stack.last.tag == "pre" || stack.last.tag == "textarea" ||
           stack.last.tag == "listing")) {
        if (s + 1 < e && input.charAt(s) == '\r' && input.charAt(s + 1) == '\n') s += 2
        else if (input.charAt(s) == '\n' || input.charAt(s) == '\r') s += 1
        if (s >= e) return
      }
      if (parentTableCtx) {
        var k = s
        while (k < e && HtmlParser.isWs(input.charAt(k))) k += 1
        if (k < e && fosterActive) throw Bail
      }
      val wasSuppressed = suppressed
      markChild()
      if (!wasSuppressed) {
        if (ampIn(s, e))
          emitText(Entities.decodeRange(input, s, e), stack.size + 1)
        else emitTextSlice(s, e, stack.size + 1)
      }
    }

    /** Returns the open raw-text element (to consume its contents) when
      * the started element is RAWTEXT/RCDATA, like the parser.
      */
    def handleStartTag(name0: String, attrs: collection.Seq[(String, String)],
        selfClosing: Boolean): Option[Open] = {
      val name = lowerFast(name0)
      name match {
        case "html" | "head" => return None
        case "body" => switchToBody(); return None
        case _ =>
      }
      val fl = TagFlags(name)
      val inForeign = foreignDepth > 0
      if (!inBody && stack.isEmpty && (fl & TagFlags.HeadContentF) == 0) switchToBody()

      // DOM parser closes the open table before a nested <table>
      if (name == "table" && parentTableCtx && tableIdxStack.nonEmpty)
        throw Bail
      // stray table-structure tags with no open table/template are
      // ignored, mirroring the DOM parser
      if ((fl & TagFlags.TableStructureF) != 0 && !inForeign &&
          tableIdxStack.isEmpty && templateIdxStack.isEmpty)
        return None
      // <a>/<nobr> with one already open: adoption-agency implied close.
      // When the open element is AT THE TOP of the stack the agency has
      // no furthest block and reduces to pop + list-entry removal — a
      // plain popOne here (very common in real markup: <a><a ...>). Any
      // deeper, the agency restructures (residue + reconstruction) and
      // the input must take the DOM path.
      if (((name == "a" && aOpen > 0) || (name == "nobr" && nobrOpen > 0)) &&
          !inForeign) {
        if (stack.nonEmpty && stack.last.tag == name) popOne()
        else throw Bail
      }

      // "clear the stack back to a table (row) context" — mirrors the
      // DOM parser exactly; formatting residue in the range bails
      if ((fl & TagFlags.TableStructureF) != 0) {
        // the last table, provided no template is open above it
        val ti = if (tableIdxStack.nonEmpty &&
            (templateIdxStack.isEmpty || templateIdxStack.last < tableIdxStack.last))
          tableIdxStack.last else -1
        if (ti >= 0) {
          // <col> with the colgroup open at the top joins it ("in column
          // group" mode), mirroring the DOM parser
          val base =
            if (name == "col" && stack.last.tag == "colgroup") stack.size - 1
            else clearBackBase(name, ti, stack.lastIndexWhere(e =>
              e.tag == "tbody" || e.tag == "thead" || e.tag == "tfoot"),
              stack.lastIndexWhere(_.tag == "tr"))
          if (base + 1 < stack.size) {
            bailOnResidue(base + 1)
            while (stack.size > base + 1) popOne()
          }
          // implicit section synthesis, mirroring the DOM parser: the
          // synthesized element takes the ordinary push path (visit,
          // skip list, child marking) so both walks see the same events
          def synth(tag: String): Unit = {
            val sfl = TagFlags(tag)
            val parentSuppressed = suppressed
            markChild()
            val v = !parentSuppressed && !skip.contains(tag)
            val depth = stack.size + 1
            if (v) emitTag(tag, sfl, NoAttrs, depth, isEnd = false)
            val o = new Open(tag, sfl, depth, NoAttrs, v)
            if (stack.size < MaxDepth) { val idx = stack.size; stack += o; trackPush(o, idx) }
          }
          val top = stack.last.tag
          name match {
            case "tr" => if (top == "table") synth("tbody")
            case "td" | "th" =>
              if (top == "table") { synth("tbody"); synth("tr") }
              else if (top == "tbody" || top == "thead" || top == "tfoot") synth("tr")
            case "col" => if (top == "table") synth("colgroup")
            case _ =>
          }
        }
      }

      // O(1) button-scope test mirroring HtmlParser.indexInButtonScope:
      // the last <p> is in button scope iff no barrier element was
      // pushed above it (global barrier counter == count at its push)
      def closePInButtonScope(): Unit = if (pIdxStack.nonEmpty) {
        val pIdx = pIdxStack.last
        if (btnBarrierOpen == stack(pIdx).btnBarrierAtPush) {
          bailOnResidue(pIdx)
          while (stack.size > pIdx) popOne()
        }
      }
      if ((fl & TagFlags.ClosesPF) != 0) closePInButtonScope()
      // li / dd / dt: the dedicated spec walk, mirroring the DOM parser
      if ((name == "li" || name == "dd" || name == "dt") && !inForeign) {
        val isLi = name == "li"
        var k = stack.size - 1
        var done = false
        while (k >= 0 && !done) {
          val t = stack(k).tag
          val hit = if (isLi) t == "li" else t == "dd" || t == "dt"
          if (hit) {
            bailOnResidue(k)
            while (stack.size > k) popOne()
            done = true
          } else if ((stack(k).flags & TagFlags.SpecialF) != 0 &&
                     t != "address" && t != "div" && t != "p") done = true
          else k -= 1
        }
        closePInButtonScope()
      }
      val implicitCloses = HtmlParser.ImplicitCloseJ.get(name)
      if (implicitCloses != null) {
        while (stack.nonEmpty && implicitCloses.contains(stack.last.tag)) popOne()
      }

      // element insertion directly in table structure: DOM fosters it
      if (parentTableCtx && (fl & TagFlags.TableAllowedF) == 0 && fosterActive)
        throw Bail

      val parentSuppressed = suppressed
      markChild()
      val visited = !parentSuppressed && !skip.contains(name)
      val depth = stack.size + 1
      if (visited) emitTag(name, fl, attrs, depth, isEnd = false)

      val isVoid = (fl & TagFlags.VoidF) != 0
      // self-closing honored only on void/foreign elements, like the parser
      if (!isVoid && !(selfClosing && inForeign)) {
        val o = new Open(name, fl, depth, attrs, visited)
        if (stack.size < MaxDepth) { val idx = stack.size; stack += o; trackPush(o, idx) }
        // beyond MaxDepth the DOM attaches children flat at the cap: the
        // element is childless forever, so no push and no end visit
        if (!inForeign && (fl & (TagFlags.RawTextF | TagFlags.RcDataF)) != 0)
          return Some(o)
      }
      None
    }

    def handleEndTag(name0: String): Unit = {
      val name = lowerFast(name0)
      name match {
        case "html" | "head" => return
        case "body" => switchToBody(); popAll(); return
        case _ =>
      }
      val efl = TagFlags(name)
      if ((efl & TagFlags.FormattingF) != 0) {
        val k = {
          var i = stack.size - 1
          while (i >= 0 && stack(i).tag != name) i -= 1
          i
        }
        if (k < 0) return
        // matched at the top: plain pop (the DOM adoption agency reduces
        // to the same); anywhere deeper: AAA restructures — bail
        if (k != stack.size - 1) throw Bail
        popOne()
        return
      }
      // `</br>` acts as a <br> start tag, mirroring the DOM parser
      if (name == "br") { handleStartTag("br", NoAttrs, selfClosing = false); return }
      def scopeWalk(extra1: String, extra2: String): Int = {
        var k = stack.size - 1
        while (k >= 0) {
          val e = stack(k)
          if (e.tag == name) return k
          if ((e.flags & TagFlags.ScopeBarrierF) != 0 ||
              e.tag == extra1 || e.tag == extra2) return -1
          k -= 1
        }
        -1
      }
      val idx =
        if ((efl & TagFlags.TableStructureF) != 0 || name == "table") {
          // TABLE scope, mirroring the DOM parser: stop at table/template
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val t = stack(k).tag
            if (t == name) found = k
            else if (t == "table" || t == "template") k = -1
            else k -= 1
          }
          found
        } else if (name == "form") {
          // spec `</form>` removes the form from the stack WITHOUT
          // popping what's above it. At the top (after implied end tags)
          // that reduces to plain pops; a mid-stack removal leaves later
          // end visits out of LIFO order — unrepresentable in a single
          // forward pass, so that input takes the DOM path.
          val fi = scopeWalk(null, null)
          if (fi >= 0) {
            while (stack.size - 1 > fi &&
                (stack.last.flags & TagFlags.MarkerF) == 0 &&
                ImpliedEndTags.contains(stack.last.tag)) popOne()
            if (fi == stack.size - 1) popOne() else throw Bail
          }
          -1
        } else if (name == "p") {
          // BUTTON scope via the O(1) barrier counter; no p in scope ->
          // the DOM parser inserts an empty p element (start visit only,
          // no child so no end visit) — mirror it
          if (pIdxStack.nonEmpty &&
              btnBarrierOpen == stack(pIdxStack.last).btnBarrierAtPush)
            pIdxStack.last
          else {
            if (inBody && !(parentTableCtx && fosterActive)) {
              val wasSuppressed = suppressed
              markChild()
              // same visit rule as any synthesized element: the skip
              // list suppresses the start visit (the DOM walk emits no
              // events for skip-list tags)
              if (!wasSuppressed && !skip.contains("p"))
                emitTag("p", TagFlags("p"), NoAttrs, stack.size + 1, isEnd = false)
            }
            -1
          }
        } else if (name == "li") {
          scopeWalk("ol", "ul") // LIST ITEM scope
        } else if (name == "dd" || name == "dt" ||
            ScopedEndTags.contains(name)) {
          scopeWalk(null, null)
        } else if (name.length == 2 && name.charAt(0) == 'h' &&
            name.charAt(1) >= '1' && name.charAt(1) <= '6') {
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val e = stack(k)
            val t = e.tag
            val isHeading = t.length == 2 && t.charAt(0) == 'h' &&
              t.charAt(1) >= '1' && t.charAt(1) <= '6'
            if (isHeading) found = k
            else if ((e.flags & TagFlags.ScopeBarrierF) != 0) k = -1
            else k -= 1
          }
          found
        } else {
          // "any other end tag": stop (ignore the token) at the first
          // special element that isn't the target, like the DOM parser
          var k = stack.size - 1
          var found = -1
          while (k >= 0 && found < 0) {
            val e = stack(k)
            if (e.tag == name) found = k
            else if ((e.flags & TagFlags.SpecialF) != 0) k = -1
            else k -= 1
          }
          found
        }
      if (idx < 0) return
      bailOnResidue(idx)
      while (stack.size > idx) popOne()
    }

    // — tokenizer main loop (mirrors HtmlParser.parse) —
    val n = input.length
    var i = 0
    // pending text is tracked as [runStart, runEnd) over the input and
    // flushed as a slice; only non-contiguous fragments (can't occur:
    // stray '<' glues runs back together contiguously) fall back to the
    // StringBuilder. The builder path stays for safety.
    val textStart = new StringBuilder
    var runStart = -1
    var runEnd = -1
    def appendFragment(s: Int, e: Int): Unit = {
      if (s >= e) return
      if (textStart.isEmpty && runStart < 0) { runStart = s; runEnd = e }
      else if (runStart >= 0 && runEnd == s) runEnd = e
      else {
        if (runStart >= 0) {
          textStart.underlying.append(input, runStart, runEnd)
          runStart = -1
        }
        textStart.underlying.append(input, s, e)
      }
    }
    def flushText(): Unit = {
      if (runStart >= 0) {
        val s = runStart
        val e = runEnd
        runStart = -1
        insertTextSlice(s, e)
      } else if (textStart.nonEmpty) {
        insertText(textStart.toString, decodeEntities = true)
        textStart.clear()
      }
    }

    var pollCtr = 0
    while (i < n) {
      // cooperative guard cancellation, amortized (see HtmlParser loop)
      pollCtr += 1
      if ((pollCtr & 0xFF) == 0) graft.core.MemGuard.poll()
      val c = input.charAt(i)
      if (c != '<') {
        var j = input.indexOf('<', i)
        if (j < 0) j = n
        appendFragment(i, j)
        i = j
      } else if (i + 1 >= n) { appendFragment(i, i + 1); i += 1 }
      else {
        val c1 = input.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (input.startsWith("<!--", i)) {
            val end = input.indexOf("-->", i + 4)
            // comments attach (marking the parent) but are never visited;
            // before the body they attach to the body element
            if (!inBody && stack.isEmpty) bodyHadChild = true else markChild()
            i = if (end < 0) n else end + 3
          } else {
            val end = input.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') {
          flushText()
          val end = input.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          val close = tagNameEnd(input, i + 2)
          if (close == i + 2) { appendFragment(i, i + 1); i += 1 }
          else {
            val name = TagNames.lookup(input, i + 2, close)
            flushText()
            val end = input.indexOf('>', close)
            i = if (end < 0) n else end + 1
            handleEndTag(name)
          }
        } else if ((c1 < 128 && ((c1 | 0x20) >= 'a' && (c1 | 0x20) <= 'z')) ||
            (c1 >= 128 && Character.isLetter(c1))) {
          val afterName = tagNameEnd(input, i + 1)
          val name = TagNames.lookup(input, i + 1, afterName)
          flushText()
          // attrs are materialized ONLY for tags the active option set
          // can read them from (default: img/area alt texts) — for
          // everything else skipAttrs scans past them allocation-free
          // (packed Int return; no per-tag tuple)
          var attrs: collection.Seq[(String, String)] = NoAttrs
          var selfClosing = false
          if (needAttrs.contains(name)) {
            val t = readAttrs(input, afterName)
            attrs = t._1; selfClosing = t._2; i = t._3
          } else {
            val packed = skipAttrs(input, afterName)
            selfClosing = (packed & 1L) != 0
            i = (packed >>> 1).toInt
          }
          handleStartTag(name, attrs, selfClosing) match {
            case Some(rawEl) =>
              // plaintext has no end tag: everything to EOF is literal
              val j = if (rawEl.tag == "plaintext") -1
                else indexOfAsciiIgnoreCase(input, "</" + rawEl.tag, i)
              val contentEnd = if (j < 0) n else j
              var s0 = i
              if (rawEl.tag == "textarea") {
                if (s0 + 1 < contentEnd && input.charAt(s0) == '\r' &&
                    input.charAt(s0 + 1) == '\n') s0 += 2
                else if (s0 < contentEnd && (input.charAt(s0) == '\n' ||
                    input.charAt(s0) == '\r')) s0 += 1
              }
              if (s0 < contentEnd) {
                rawEl.hadChild = true
                // the contents are only materialized when they'll be
                // emitted (script/style are usually on the skip list) and
                // only decoded when RCDATA with an actual reference
                if (rawEl.visited) {
                  if ((rawEl.flags & TagFlags.RcDataF) != 0 && ampIn(s0, contentEnd))
                    emitText(Entities.decodeRange(input, s0, contentEnd),
                      rawEl.depth + 1)
                  else emitTextSlice(s0, contentEnd, rawEl.depth + 1)
                }
              }
              if (j < 0) i = n
              else {
                val gt = input.indexOf('>', j)
                i = if (gt < 0) n else gt + 1
              }
              if (stack.nonEmpty && (stack.last eq rawEl)) popOne()
              // beyond the depth cap the element was never pushed, but the
              // DOM still gives it the text child and hence an end visit
              else if (rawEl.visited && rawEl.hadChild)
                emitTag(rawEl.tag, rawEl.flags, rawEl.attrs, rawEl.depth, isEnd = true)
            case None =>
          }
        } else { appendFragment(i, i + 1); i += 1 }
      }
    }
    flushText()
    // EOF: unwind still-open elements, then the body's own end visit
    popAll()
    if (bodyHadChild) emitTag("body", TagFlags("body"), Nil, 0, isEnd = true)

    Html2Text.rstrip(Html2Text.serialize(nodes, opts))
  }
}
