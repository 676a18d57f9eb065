package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.core.{Encodings, HttpDecode}

/** Column functions for noisy web payloads: charset detection, resilient
  * decoding, MIME sniffing, HTTP body decompression.
  *
  * These are Scala UDFs by design: each wraps a JVM library kernel (ICU
  * charset detection, java.util.zip) that has no Catalyst-expression
  * equivalent, and each is a per-row pure function on a binary column —
  * the Spark analog of the reference's per-document nogil kernels
  * (encoding.pyx, warc.pyx:785-837). They sit AFTER pushdown/pruning in
  * any sane plan, so the codegen break costs one virtual call per row on
  * already-filtered data.
  */
object Web {

  /** detect_encoding(content) -> canonical charset name (never null:
    * utf-8 fallback). Head/tail-sampled at 128 KiB like the reference.
    */
  val detectEncoding: Column => Column = {
    val f = udf((data: Array[Byte]) =>
      if (data == null) null
      else Encodings.detectEncoding(data, fromHtmlMeta = true).orNull)
    c => f(c)
  }

  /** detect_mime(content) -> MIME type by magic bytes. */
  val detectMime: Column => Column = {
    val f = udf((data: Array[Byte]) =>
      if (data == null) null else Encodings.detectMime(data))
    c => f(c)
  }

  /** bytes_to_str(content, charset) -> string via the resilient decode
    * ladder (never fails; BOM stripped; utf-8/cp1252 fallbacks).
    */
  val bytesToStr: (Column, Column) => Column = {
    val f = udf((data: Array[Byte], enc: String) =>
      if (data == null) null
      else Encodings.bytesToStr(data, Option(enc).getOrElse("utf-8")))
    (c, e) => f(c, e)
  }

  /** Decode content per the charset detected from the content itself. */
  def decodeText(content: Column): Column =
    bytesToStr(content, detectEncoding(content))

  /** decode_http_body(body, content_encoding, transfer_encoding) ->
    * struct(body binary, applied array<string>, failed string).
    * Encodings applied in reverse chain order; failures surface in
    * `failed`, never as task errors.
    */
  val decodeHttpBody: (Column, Column, Column) => Column = {
    val f = udf((data: Array[Byte], ce: String, te: String) =>
      if (data == null) null
      else HttpDecode.decodeBody(data, Option(ce), Option(te)))
    (b, ce, te) => f(b, ce, te)
  }

  /** dechunk(body) -> binary (null if not parseable as chunked). */
  val dechunk: Column => Column = {
    val f = udf((data: Array[Byte]) =>
      if (data == null) null else HttpDecode.dechunk(data).orNull)
    c => f(c)
  }

  // — HTML (graft.html parser; DOM stays inside the expression,
  //   results come out as scalar columns — SURVEY §1.4) —

  /** html_title(content, charset) -> document title. */
  val htmlTitle: (Column, Column) => Column = {
    val f = udf((data: Array[Byte], charset: String) =>
      if (data == null) null
      else graft.html.HtmlTree.parseFromBytes(data, charset).title)
    (c, cs) => f(c, cs)
  }

  /** select_css(content, charset, selector) -> array<string> of the
    * matched elements' text contents (document order).
    */
  val selectCssText: (Column, Column, String) => Column = {
    val f = udf((data: Array[Byte], charset: String, selector: String) =>
      if (data == null) null
      else graft.html.HtmlTree.parseFromBytes(data, charset)
        .body.querySelectorAll(selector).map(_.text))
    (c, cs, sel) => f(c, cs, org.apache.spark.sql.functions.lit(sel))
  }

  /** css_matches(content, charset, selector) -> boolean: any element in
    * the body subtree matches.
    */
  val cssMatches: (Column, Column, String) => Column = {
    val f = udf((data: Array[Byte], charset: String, selector: String) =>
      if (data == null) false
      else graft.html.HtmlTree.parseFromBytes(data, charset).body.matches(selector))
    (c, cs, sel) => f(c, cs, org.apache.spark.sql.functions.lit(sel))
  }

  /** count_css(content, charset, selector) -> int matched-element count. */
  val countCss: (Column, Column, String) => Column = {
    val f = udf((data: Array[Byte], charset: String, selector: String) =>
      if (data == null) 0
      else graft.html.HtmlTree.parseFromBytes(data, charset)
        .body.querySelectorAll(selector).size)
    (c, cs, sel) => f(c, cs, org.apache.spark.sql.functions.lit(sel))
  }

  /** extract_links(content, charset, base_url) -> array<string> of
    * absolutized a[href] targets in document order (the link-graph /
    * frontier extraction pass).
    */
  val extractLinks: (Column, Column, Column) => Column = {
    val f = udf((data: Array[Byte], charset: String, base: String) =>
      if (data == null) null
      else graft.html.HtmlRewrite.collectLinks(
        graft.html.HtmlTree.decodeForParse(data, charset),
        if (base == null) "" else base))
    (c, cs, b) => f(c, cs, b)
  }

  // — DOM mutation / rewrite (html.pyx:1216-1332 surface, packaged as
  //   whole-document transforms — see graft.html.HtmlRewrite) —

  /** html_remove(content, charset, selector) -> string: decompose every
    * matching subtree, serialize the rest (boilerplate / tracker
    * stripping before re-archival).
    */
  val htmlRemove: (Column, Column, String) => Column = {
    val f = udf((data: Array[Byte], charset: String, selector: String) =>
      if (data == null) null
      else graft.html.HtmlRewrite.removeSelector(
        graft.html.HtmlTree.decodeForParse(data, charset), selector))
    (c, cs, sel) => f(c, cs, org.apache.spark.sql.functions.lit(sel))
  }

  /** html_set_attr(content, charset, selector, name, value) -> string. */
  def htmlSetAttr(content: Column, charset: Column, selector: String,
      name: String, value: String): Column = {
    val f = udf((data: Array[Byte], cs: String, sel: String, n: String, v: String) =>
      if (data == null) null
      else graft.html.HtmlRewrite.setAttr(
        graft.html.HtmlTree.decodeForParse(data, cs), sel, n, v))
    f(content, charset, org.apache.spark.sql.functions.lit(selector),
      org.apache.spark.sql.functions.lit(name), org.apache.spark.sql.functions.lit(value))
  }

  /** html_del_attr(content, charset, selector, name) -> string. */
  def htmlDelAttr(content: Column, charset: Column, selector: String,
      name: String): Column = {
    val f = udf((data: Array[Byte], cs: String, sel: String, n: String) =>
      if (data == null) null
      else graft.html.HtmlRewrite.delAttr(
        graft.html.HtmlTree.decodeForParse(data, cs), sel, n))
    f(content, charset, org.apache.spark.sql.functions.lit(selector),
      org.apache.spark.sql.functions.lit(name))
  }

  /** html_absolutize(content, charset, base_url) ->
    * struct<html:string, n_rewritten:int>: resolve relative href/src/
    * action URLs against the record's own URL (WARC-Target-URI) —
    * link-graph extraction and re-archival both need absolute URLs.
    */
  val htmlAbsolutize: (Column, Column, Column) => Column = {
    val f = udf((data: Array[Byte], charset: String, base: String) =>
      if (data == null || base == null) null
      else {
        val (h, n) = graft.html.HtmlRewrite.absolutizeLinks(
          graft.html.HtmlTree.decodeForParse(data, charset), base)
        (h, n)
      })
    (c, cs, b) => f(c, cs, b).cast("struct<html:string,n_rewritten:int>")
  }

  /** Default per-document DOM budget. 2M nodes is ~40x the largest page
    * in a typical crawl sample (a node costs ~100 B here, so the budget
    * caps one document's DOM at ~200 MB) — real pages never hit it, a
    * crafted DOM bomb does. Guarding by DEFAULT is the reference's
    * process_guard doctrine (process_guard.pyx:184-533): one bomb in
    * 100 TB must cost one null row, never an executor OOM.
    *
    * DELIBERATE DEVIATION from the reference API: resiliparse's
    * process_guard is opt-in, so its default path would OOM on the same
    * bomb. Breaches on the default path are not fully silent — each
    * executor counts them ([[graft.plans.ExtractKernels.memGuardBreaches]])
    * and logs the first few at WARN; pipelines that need the per-row
    * reason switch to [[extractPlainTextGuarded]].
    */
  val DefaultMaxNodes: Int = 2000000

  /** extract_plain_text(content, charset, main_content) -> string — the
    * flagship compound operator (decode -> HTML parse -> classifier ->
    * serializer), defaults matching the reference (basic formatting,
    * bullets, alt texts). A native Catalyst expression (no UDF island in
    * the plan — see [[graft.plans.ExtractPlainTextExpr]]); `maxNodes` is
    * the per-document MemGuard budget, ON by default (breach -> null;
    * use [[extractPlainTextGuarded]] for the breach reason).
    */
  def extractPlainText(content: Column, charset: Column,
      mainContent: Boolean = false, maxNodes: Int = DefaultMaxNodes): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.ExtractPlainTextExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(content),
        org.apache.spark.sql.GraftColumnBridge.expression(charset),
        mainContent, maxNodes))

  /** MemGuard-surfacing variant: struct<text:string, error:string>. A
    * budget breach (one bomb document exploding into a huge DOM) yields
    * a row with `error` set — the exc_loop error-column doctrine
    * (process_guard.pyx:184-533 semantics at operator level) — never a
    * task OOM.
    *
    * `maxAllocBytes` adds the whole-record ALLOCATION watchdog
    * ([[graft.core.MemGuard.allocationLimited]]): a record whose
    * expansion balloons OUTSIDE the node budget (one giant text node, a
    * pathological decode ladder) is interrupted at the next kernel
    * cancellation point and surfaced as an error row. Default 2 GiB —
    * far above any legitimate page, far below an executor heap.
    */
  def extractPlainTextGuarded(content: Column, charset: Column,
      mainContent: Boolean = false, maxNodes: Int = DefaultMaxNodes,
      maxAllocBytes: Long = 2L << 30): Column = {
    val f = udf((data: Array[Byte], cs: String, mc: Boolean, mn: Int, mab: Long) =>
      if (data == null) null
      else graft.core.MemGuard.allocationLimited(mab) {
        try {
          (graft.html.Html2Text.extractFromHtml(
            graft.html.HtmlTree.decodeForParse(data, cs),
            graft.html.Html2Text.Options(mainContent = mc, maxNodes = mn)), null: String)
        } catch {
          case e: graft.core.MemGuardException => (null: String, e.getMessage)
        }
      }.fold(err => (null: String, err), identity))
    f(content, charset, org.apache.spark.sql.functions.lit(mainContent),
      org.apache.spark.sql.functions.lit(maxNodes),
      org.apache.spark.sql.functions.lit(maxAllocBytes))
      .cast("struct<text:string,error:string>")
  }

  // — language detection (detect_fast, lang.pyx:111-175) —

  /** detect_lang(text) -> struct<lang:string, rank:int> — a native
    * Catalyst expression (see [[graft.plans.DetectLangExpr]]): the w16
    * plan keeps whole-stage codegen instead of a UDF island.
    */
  val detectLang: Column => Column = { c =>
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.DetectLangExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))
  }

  /** detect_lang restricted to a language set. */
  def detectLangIn(text: Column, langs: Set[String]): Column = {
    val f = udf((t: String) =>
      if (t == null) null
      else graft.core.LangDetect.detectFast(t, langs = Some(langs))._1)
    f(text)
  }

  /** train_language_examples as a typed Aggregator: per-group elementwise
    * mean of hashed n-gram vectors (lang.pyx:196-226) — partial-agg
    * friendly (sum vectors + count merge associatively; divide at finish).
    */
  val trainLangVector: org.apache.spark.sql.expressions.UserDefinedFunction = {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    val agg = new Aggregator[String, (Array[Long], Long), Array[Int]] {
      def zero: (Array[Long], Long) = (new Array[Long](graft.core.LangDetect.VecSize), 0L)
      def reduce(b: (Array[Long], Long), text: String): (Array[Long], Long) = {
        if (text == null) return b
        val v = graft.core.LangDetect.strToVec(text)
        var i = 0
        while (i < v.length) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
      def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
      def finish(b: (Array[Long], Long)): Array[Int] =
        if (b._2 == 0) new Array[Int](graft.core.LangDetect.VecSize)
        else Array.tabulate(graft.core.LangDetect.VecSize)(i =>
          math.min(255L, b._1(i) / b._2).toInt)
      def bufferEncoder: Encoder[(Array[Long], Long)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
      def outputEncoder: Encoder[Array[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    }
    org.apache.spark.sql.functions.udaf(agg)
  }

  /** canonical_url(url) — crawl-frontier URL canonicalization (the d21
    * dedup key): lowercase the scheme and host, strip a leading `www.`,
    * drop the scheme's DEFAULT port (443 for https, 80 for http — a
    * non-default port is identity-bearing and survives), trim the
    * trailing slash (root stays `/`), drop `utm_*` tracking params and
    * sort what survives. Pure Catalyst string expressions (NOT a UDF —
    * this runs on every manifest row of a 100 TB crawl, it must stay
    * inside whole-stage codegen).
    */
  def canonicalUrl(url: Column): Column = {
    import org.apache.spark.sql.functions._
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_extract(url, "^[A-Za-z]+://([^/:?]+)", 1)
    val port = regexp_extract(url, "^[A-Za-z]+://[^/:?]+:([0-9]+)", 1)
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?]+([^?]*)", 1)
    val query = regexp_extract(url, "\\?(.*)$", 1)
    val chost = regexp_replace(lower(host), "^www\\.", "")
    val defaultPort = (scheme === "https" && port === "443") ||
      (scheme === "http" && port === "80") || port === ""
    val cport = when(defaultPort, lit("")).otherwise(concat(lit(":"), port))
    val trimmedPath = regexp_replace(rawPath, "/$", "")
    val cpath = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val kept = array_join(array_sort(filter(split(query, "&"),
      x => substring(x, 1, 4) =!= "utm_" && x =!= "")), "&")
    concat(scheme, lit("://"), chost, cport, cpath,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }
}
