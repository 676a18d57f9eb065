package graft.tools

import graft.core._
import java.io.{BufferedOutputStream, FileInputStream, FileOutputStream, OutputStream, PrintStream}

/** Single-node CLI front door mirroring the reference's executable UX
  * (fastwarc-py/fastwarc/cli.py: recompress :59-108, check :110-183,
  * extract :185-223, index :225-285, benchmark :352-420). Each
  * subcommand wraps the same core kernels the oracle-gated queries run
  * (WarcParser / WarcWriter / Digests), so CLI output and query output
  * agree by construction:
  *
  *   graft.tools.Cli index <files...> [--fields f1,f2,...]
  *   graft.tools.Cli extract <file> <offset> [--payload | --headers]
  *   graft.tools.Cli recompress <in> <out> [--codec gzip|lz4|zstd|none] [--zstd-dict] [--dict=<file>] [--checksum]
  *   graft.tools.Cli dict-train <in> <dict-out> [--max-samples=N] [--dict-size=N]
  *   graft.tools.Cli verify <file> [--payloads]
  *   graft.tools.Cli benchmark <files...> [--parse-http] [--filter-type T]
  *
  * Run via `java -cp target/scala-2.13/classes:SPARK_JARS graft.tools.Cli`
  * (or sbt "runMain graft.tools.Cli ..."). The distributed analogs are
  * the `warc` DataSource + queries w07/w22/w23/w03/w17 — this entry
  * point exists for the reference's one-file, no-cluster workflows.
  */
object Cli {

  def main(args: Array[String]): Unit = sys.exit(run(args, Console.out))

  /** Testable entry: returns the exit code, prints to `out`. */
  def run(args: Array[String], out: PrintStream): Int = {
    if (args.isEmpty) { usage(out); return 2 }
    val (flags, pos) = args.tail.partition(_.startsWith("--"))
    def flag(name: String): Boolean = flags.contains(s"--$name")
    def flagVal(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") => f.drop(name.length + 3) }
    try args.head match {
      case "index" =>
        if (pos.isEmpty) { usage(out); return 2 }
        if (flag("members")) {
          // member-index builder for FOREIGN archives: one sequential
          // container walk per file emits the same `.idx` sidecar the
          // WARC sink writes, unlocking the scan's member-parallel
          // intra-file splits on stock Common Crawl files
          var rc = 0
          pos.foreach { f =>
            val base = f.substring(f.lastIndexOf('/') + 1)
            // the sidecar commits ATOMICALLY (dot-tmp sibling + rename,
            // the emit_member_index side-output's discipline): a scan
            // planning IdxSlice partitions from a half-written sidecar
            // would compute slices from the in-progress length and lose
            // the members appended after plan time. The tmp opens BEFORE
            // the scan (fail fast — a read-only scheme must not burn a
            // full remote walk first); http(s) is read-only by
            // construction, so its sidecar lands in the working
            // directory with a note
            val idxPath =
              if (f.startsWith("http://") || f.startsWith("https://")) {
                val local = base + ".idx"
                out.println(s"$f: read-only scheme — sidecar written to ./$local")
                local
              } else f + ".idx"
            val tmpPath = tmpSibling(idxPath)
            val sink = createOut(tmpPath)
            val res =
              try {
                val in = openRaw(f)
                try MemberIndex.scan(in) finally in.close()
              } catch { case e: Throwable =>
                // close the never-written tmp stream BEFORE deleting it:
                // an open s3a upload would otherwise leak, and deferred
                // deletes of open files recreate the debris on close
                try sink.close() catch { case _: Exception => }
                deleteQuiet(tmpPath); throw e
              }
            val w = new java.io.PrintWriter(new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(sink,
                java.nio.charset.StandardCharsets.UTF_8)))
            try res.offsets.foreach(o =>
              w.println(s"""{"filename":${jsonStr(base)},"offset":$o}"""))
            finally w.close()
            // PrintWriter swallows I/O errors — a full disk must not
            // atomically publish a truncated sidecar with exit code 0
            if (w.checkError()) {
              deleteQuiet(tmpPath)
              throw new java.io.IOException(
                s"sidecar write failed for $idxPath (disk full or I/O error)")
            }
            commitTmp(tmpPath, idxPath)
            out.println(s"$idxPath: ${res.offsets.size} members (${res.codec})" +
              res.error.map(e => s"; INCOMPLETE: $e").getOrElse(""))
            if (!res.isComplete) rc = 1
          }
          return rc
        }
        val fields = flagVal("fields").getOrElse("offset,warc-type,warc-target-uri")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        pos.foreach(f => index(f, fields, out))
        0
      case "extract" =>
        if (pos.length != 2) { usage(out); return 2 }
        extract(pos(0), pos(1).toLong, flag("payload"), flag("headers"), out)
      case "dict-train" =>
        // stage 1 of the dictionary lifecycle alone: sample an archive,
        // train, emit the dictionary artifact — reused by
        // `recompress --dict=<file>` and the sink's `zstd_dict` option
        // (train once on one shard, apply to the whole corpus)
        if (pos.length != 2) { usage(out); return 2 }
        WarcWriter.trainDictionary(
          () => openRaw(pos(0)), flag("checksum"),
          flagVal("max-samples").map(_.toInt).getOrElse(256),
          flagVal("dict-size").map(_.toInt).getOrElse(0)) match {
          case Some(d) =>
            val o = new BufferedOutputStream(createOut(pos(1)))
            try o.write(d) finally o.close()
            out.println(s"trained dictionary: ${d.length} bytes -> ${pos(1)}")
            0
          case None =>
            out.println("dictionary training declined (too few or " +
              "too-uniform samples); archives can be written dict-less")
            1
        }
      case "recompress" =>
        if (pos.length != 2) { usage(out); return 2 }
        // --dict=<file>: reuse a pre-trained dictionary (dict-train's
        // artifact) — dictionary skippable frame + per-record frames
        // compressed against it, no training pass
        flagVal("dict") match {
          case Some(dictPath) =>
            val dict = {
              val din = openRaw(dictPath)
              try org.apache.commons.io.IOUtils.toByteArray(din)
              finally din.close()
            }
            // same bound the sink's zstd_dict option enforces: readers
            // reject oversized dictionary frames (ZstdWarc.MaxDictBytes),
            // so writing one would emit an archive nothing can decode
            if (dict.length > graft.core.ZstdWarc.MaxDictBytes) {
              out.println(s"dictionary too large: ${dict.length} bytes " +
                s"(max ${graft.core.ZstdWarc.MaxDictBytes}); readers would " +
                "reject the dictionary frame — retrain with --dict-size")
              return 2
            }
            val in = openRaw(pos(0))
            val o = new BufferedOutputStream(createOut(pos(1)))
            val n = try {
              val (stream, _) = WarcCodecs.open(in)
              val parser = new WarcParser(new WarcByteReader(stream), "",
                WarcParseOptions(parseHttp = false))
              val w = new WarcWriter.RecordStreamWriter(
                o, WarcWriter.Zstd, flag("checksum"), zstdDict = dict)
              parser.foreach(w.write)
              w.finishCodecs()
              o.flush()
              w.recordsWritten
            } finally { o.close(); in.close() }
            out.println(s"$n records recompressed to ${pos(1)} " +
              s"(pre-trained dictionary: ${dict.length} bytes)")
            return 0
          case None =>
        }
        // --zstd-dict: the two-pass trained-dictionary `.warc.zst` form
        // (wget's shape) — dictionary skippable frame + per-record
        // frames compressed against it
        if (flag("zstd-dict")) {
          val o = new BufferedOutputStream(createOut(pos(1)))
          val (n, dictLen) = try WarcWriter.recompressZstdTrained(
              () => openRaw(pos(0)), o, flag("checksum"))
            finally o.close()
          out.println(s"$n records recompressed to ${pos(1)}" +
            dictLen.map(l => s" (trained dictionary: $l bytes)")
              .getOrElse(" (dictionary training declined; written dict-less)"))
          return 0
        }
        val codec = flagVal("codec").getOrElse("gzip") match {
          case "gzip" => WarcWriter.Gzip
          case "lz4" => WarcWriter.Lz4
          case "zstd" | "zst" => WarcWriter.Zstd
          case "none" | "uncompressed" => WarcWriter.Raw
          case other => out.println(s"unknown codec: $other"); return 2
        }
        val in = openRaw(pos(0))
        val o = new BufferedOutputStream(createOut(pos(1)))
        val n = try WarcWriter.recompress(in, o, codec, flag("checksum"))
          finally { o.close(); in.close() }
        out.println(s"$n records recompressed to ${pos(1)}")
        0
      case "verify" =>
        if (pos.length != 1) { usage(out); return 2 }
        verify(pos(0), flag("payloads"), out)
      case "benchmark" =>
        if (pos.isEmpty) { usage(out); return 2 }
        benchmark(pos.toSeq, flag("parse-http"), flagVal("filter-type"), out)
        0
      case "lang" =>
        // language-model maintenance surface (train/eval/dump-vectors/
        // benchmark/download-wiki-dumps) — see LangCli for the mapping
        LangCli.run(pos.toSeq, flags.toSeq, out)
      case "encoding" =>
        // `encoding download-whatwg-mapping` (resiliparse-py/resiliparse/
        // cli.py:67-96): fetch the WHATWG encodings.json, apply the
        // reference's canonicalization (iso-8859-8-i -> iso-8859-8,
        // windows-874 -> iso-8859-11, platform codec lookup, unknown
        // codecs skipped with a note) and print the sorted label ->
        // canonical mapping. `--check` additionally diffs the download
        // against the engine's shipped static table (the regeneration
        // loop the reference uses this command for) and exits 1 on
        // drift. `--url=` overrides the source (tests point it at a
        // loopback server; the default needs network).
        if (pos.length != 1 || pos(0) != "download-whatwg-mapping") {
          usage(out); return 2
        }
        downloadWhatwgMapping(
          flagVal("url").getOrElse("https://encoding.spec.whatwg.org/encodings.json"),
          flag("check"), out)
      case "html" =>
        // `html benchmark <warc>` (resiliparse-py/resiliparse/cli.py:106-173):
        // <title> extraction over every response record, single thread —
        // the reference's HTML-parser benchmark harness. Same kernel
        // chain as the w12/w13 queries (detect_encoding -> bytes_to_str
        // -> parse), so the rate measured here is the distributed rate
        // per core.
        if (pos.length != 2 || pos(0) != "benchmark") { usage(out); return 2 }
        htmlBenchmark(pos(1), out)
        0
      case other =>
        out.println(s"unknown subcommand: $other"); usage(out); 2
    } catch {
      case e: Exception => out.println(s"error: ${e.getMessage}"); 1
    }
  }

  private def usage(out: PrintStream): Unit = out.println(
    """usage: graft.tools.Cli <subcommand> [args]
      |  index <files...> [--fields=offset,length,filename,warc-type,warc-target-uri,http:status,...]
      |  index <files...> --members        (emit <file>.idx member-offset sidecars for parallel rescan)
      |  extract <file> <offset> [--payload | --headers]
      |  recompress <infile> <outfile> [--codec=gzip|lz4|zstd|none] [--zstd-dict] [--dict=<file>] [--checksum]
      |  dict-train <infile> <dict-outfile> [--max-samples=N] [--dict-size=N] [--checksum]
      |  verify <file> [--payloads]
      |  benchmark <files...> [--parse-http] [--filter-type=response]
      |  html benchmark <file>             (<title>-extraction parser benchmark)
      |  encoding download-whatwg-mapping [--url=U] [--check]
      |  lang train|eval|dump-vectors|benchmark|download-wiki-dumps ...""".stripMargin)

  /** Fetch + canonicalize the WHATWG encoding labels (see the `encoding`
    * dispatch note). Canonical names resolve through the JVM charset
    * registry — the platform analog of the reference's
    * `codecs.lookup(n).name` — lowercased; labels whose codec the
    * platform lacks are skipped with a note, exactly like the
    * reference's LookupError branch.
    */
  private def downloadWhatwgMapping(url: String, check: Boolean,
      out: PrintStream): Int = {
    val conn = new java.net.URL(url).openConnection()
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(60000)
    val body = {
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(body)
    val mapped = scala.collection.mutable.SortedMap[String, String]()
    root.forEach { group =>
      Option(group.get("encodings")).foreach(_.forEach { enc =>
        var n = enc.get("name").asText().toLowerCase
        // the reference's special cases (cli.py:81-86): the WHATWG
        // "iso-8859-8-i" logical variant collapses onto iso-8859-8 (the
        // raw name maps too), and windows-874 rides iso-8859-11
        if (n == "iso-8859-8-i") { n = "iso-8859-8"; mapped(n) = n }
        else if (n == "windows-874") n = "iso-8859-11"
        scala.util.Try(java.nio.charset.Charset.forName(n).name().toLowerCase) match {
          case scala.util.Failure(_) =>
            out.println(s"skipped ${enc.get("name").asText()}")
          case scala.util.Success(canonical) =>
            mapped(canonical) = canonical
            Option(enc.get("labels")).foreach(_.forEach(l =>
              mapped(l.asText()) = canonical))
        }
      })
    }
    mapped.foreach { case (label, canonical) => out.println(s"$label\t$canonical") }
    if (!check) return 0
    // drift report vs the shipped static table: compare by RESOLVED
    // charset (name spellings differ between the WHATWG list and the
    // JVM registry; "windows-1252" vs "windows-1252" vs "cp1252" must
    // not count as drift)
    var drift = 0
    mapped.foreach { case (label, canonical) =>
      Encodings.mapToHtml5(label, fallbackUtf8 = false) match {
        case None =>
          out.println(s"DRIFT $label: absent from the shipped table")
          drift += 1
        case Some(shipped) =>
          val a = scala.util.Try(java.nio.charset.Charset.forName(shipped)).toOption
          val b = scala.util.Try(java.nio.charset.Charset.forName(canonical)).toOption
          if (a.isDefined && b.isDefined && a != b) {
            out.println(s"DRIFT $label: shipped=$shipped downloaded=$canonical")
            drift += 1
          }
      }
    }
    out.println(s"$drift drift entries vs the shipped WHATWG table")
    if (drift == 0) 0 else 1
  }

  // ---- scheme-aware IO (reference parity: cli.py:291-348 accepts
  // s3://, http(s):// and plain paths on every subcommand; here any
  // Hadoop-registered scheme resolves — s3 rewrites to s3a unless the
  // deployment bound fs.s3.impl, http(s) binds Hadoop's read-only FS) --

  private def hasScheme(path: String): Boolean =
    path.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*") && !path.startsWith("file://")

  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    graft.sources.WarcInput.withHttpFs(
      new org.apache.hadoop.conf.Configuration())

  private def openRaw(path: String): java.io.InputStream =
    if (hasScheme(path)) {
      val conf = hadoopConf()
      val hp = new org.apache.hadoop.fs.Path(
        graft.sources.WarcInput.normalizeScheme(path, conf))
      hp.getFileSystem(conf).open(hp)
    } else new FileInputStream(
      if (path.startsWith("file://")) new java.net.URI(path).getPath else path)

  /** Dot-prefixed writer-unique tmp sibling of `path` (same directory,
    * same filesystem, so the commit rename is atomic where the FS
    * supports it); dot-prefixed so scans never list it as data.
    */
  private def tmpSibling(path: String): String = {
    val suffix = s".${ProcessHandle.current.pid}-${System.nanoTime()}.tmp"
    // plain string surgery, NOT hadoop Path round-tripping: Path.toString
    // renders scheme://... as scheme:/... which no longer matches
    // hasScheme, silently rerouting the tmp write to the local FS
    val cut = path.lastIndexOf('/')
    if (cut < 0) s".$path$suffix"
    else path.substring(0, cut + 1) + "." + path.substring(cut + 1) + suffix
  }

  private def deleteQuiet(path: String): Unit =
    try {
      if (hasScheme(path)) {
        val conf = hadoopConf()
        val hp = new org.apache.hadoop.fs.Path(
          graft.sources.WarcInput.normalizeScheme(path, conf))
        hp.getFileSystem(conf).delete(hp, false): Unit
      } else java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        if (path.startsWith("file://")) new java.net.URI(path).getPath
        else path)): Unit
    } catch { case _: Exception => }

  /** Atomic publish of a fully written tmp file at its final path. */
  private def commitTmp(tmp: String, dest: String): Unit =
    if (hasScheme(dest)) {
      val conf = hadoopConf()
      val dp = new org.apache.hadoop.fs.Path(
        graft.sources.WarcInput.normalizeScheme(dest, conf))
      val tp = new org.apache.hadoop.fs.Path(
        graft.sources.WarcInput.normalizeScheme(tmp, conf))
      val fs = dp.getFileSystem(conf)
      fs.delete(dp, false)
      if (!fs.rename(tp, dp)) {
        fs.delete(tp, false)
        throw new java.io.IOException(
          s"sidecar commit failed: rename $tmp -> $dest returned false")
      }
    } else {
      def local(p: String) =
        if (p.startsWith("file://")) new java.net.URI(p).getPath else p
      java.nio.file.Files.move(
        java.nio.file.Paths.get(local(tmp)), java.nio.file.Paths.get(local(dest)),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  private def createOut(path: String): java.io.OutputStream =
    if (hasScheme(path)) {
      val conf = hadoopConf()
      val hp = new org.apache.hadoop.fs.Path(
        graft.sources.WarcInput.normalizeScheme(path, conf))
      hp.getFileSystem(conf).create(hp, true)
    } else new FileOutputStream(
      if (path.startsWith("file://")) new java.net.URI(path).getPath else path)

  private def open(path: String): (java.io.InputStream, WarcCodecs.Codec) =
    WarcCodecs.openWithName(openRaw(path), path)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** CDXJ-style JSON lines with a configurable field list — `offset`,
    * `length`, `filename`, `http:status`, `http:<header>` or any WARC
    * header name (cli.py:225-253 field semantics; the w07 query is the
    * distributed analog).
    */
  private def index(path: String, fields: Seq[String], out: PrintStream): Unit = {
    val (in, _) = open(path)
    val reader = new WarcByteReader(in)
    val parser = new WarcParser(reader, path)
    // like the reference (cli.py:275-284) and the w07 lead() window, a
    // record's indexed length is the distance to the NEXT record's
    // offset (stream end for the last one) — it includes the trailing
    // record separator the in-record accounting excludes
    def emit(rec: WarcRecord, nextOffset: Long): Unit = {
      val kvs = fields.flatMap { f =>
        val v: Option[String] = f match {
          case "offset" => Some(rec.offset.toString)
          case "length" => Some((nextOffset - rec.offset).toString)
          case "filename" => Some(path)
          case "http:status" => rec.http.flatMap(_.status).map(_.toString)
          case h if h.startsWith("http:") => rec.http.flatMap(_.headers.get(h.drop(5)))
          case h => rec.headers.get(h)
        }
        v.map { value =>
          val quoted = if (f == "offset" || f == "length") value else jsonStr(value)
          s"${jsonStr(f)}: $quoted"
        }
      }
      out.println(kvs.mkString("{", ", ", "}"))
    }
    try {
      var prev: WarcRecord = null
      parser.foreach { rec =>
        if (prev != null) emit(prev, rec.offset)
        prev = rec
      }
      if (prev != null) emit(prev, reader.position)
    } finally in.close()
  }

  /** Point lookup by stream offset (cli.py:185-223; w22's
    * WarcPointLookup is the same kernel).
    */
  private def extract(path: String, offset: Long, payload: Boolean,
      headersOnly: Boolean, out: PrintStream): Int = {
    val recOpt =
      if (hasScheme(path)) {
        val conf = hadoopConf()
        WarcPointLookup.extractAllFs(
          new org.apache.hadoop.fs.Path(
            graft.sources.WarcInput.normalizeScheme(path, conf)),
          Seq(offset), WarcParseOptions(), conf).getOrElse(offset, None)
      } else WarcPointLookup.extract(path, offset)
    recOpt match {
      case None => out.println(s"no record at offset $offset"); 1
      case Some(rec) =>
        val os: OutputStream = out
        if (payload) os.write(rec.http.map(_.body).getOrElse(rec.content))
        else {
          rec.headers.entries.foreach { case (k, v) => out.println(s"$k: $v") }
          out.println()
          if (!headersOnly) os.write(rec.content)
        }
        os.flush()
        0
    }
  }

  /** Block (and optionally payload) digest verification report
    * (cli.py:110-183; the w03 query is the distributed analog). Exit 1
    * when any verifiable digest fails.
    */
  private def verify(path: String, payloads: Boolean, out: PrintStream): Int = {
    val (in, _) = open(path)
    val parser = new WarcParser(new WarcByteReader(in), path)
    var n = 0L
    var noDigest = 0L
    var ok = 0L
    var failed = 0L
    try parser.foreach { rec =>
      n += 1
      val block = rec.blockDigestOk
      val pay = if (payloads) rec.payloadDigestOk else None
      (block, pay) match {
        case (None, None) => noDigest += 1
        case (b, p) =>
          if (b.contains(false) || p.contains(false)) {
            failed += 1
            out.println(s"FAIL offset=${rec.offset} type=${rec.recordType}" +
              s" block=${b.map(_.toString).getOrElse("-")}" +
              s" payload=${p.map(_.toString).getOrElse("-")}")
          } else ok += 1
      }
    } finally in.close()
    out.println(s"$n records: $ok verified, $failed failed, $noDigest without digests")
    if (failed > 0) 1 else 0
  }

  /** HTML-parser benchmark (resiliparse cli.py:106-173): parse every
    * response payload (charset auto-detected, WHATWG-remapped) and read
    * the document title, reporting docs/s.
    */
  private def htmlBenchmark(path: String, out: PrintStream): Unit = {
    out.println("HTML parser benchmark <title> extraction:")
    out.println("=========================================")
    val (in, _) = open(path)
    val parser = new WarcParser(new WarcByteReader(in), path,
      WarcParseOptions(recordTypeMask = RecordType.maskOf(Seq("response")),
        parseHttp = true))
    val t0 = System.nanoTime()
    var n = 0L
    var titled = 0L
    try parser.foreach { rec =>
      val body = rec.http.map(_.body).getOrElse(rec.content)
      val t = graft.html.HtmlTree.parseFromBytes(body).title
      n += 1
      if (t.nonEmpty) titled += 1
    } finally in.close()
    // floor the elapsed time: a tiny input can otherwise print an
    // Infinity/NaN rate
    val sec = math.max((System.nanoTime() - t0) / 1e9, 1e-9)
    out.println(f"graft: $n documents ($titled with <title>) in $sec%.2f s" +
      f" (${n / sec}%.2f documents/s)")
  }

  /** Plain scan-throughput benchmark (cli.py:352-420): records/s for an
    * envelope(+http) pass over local files.
    */
  private def benchmark(paths: Seq[String], parseHttp: Boolean,
      filterType: Option[String], out: PrintStream): Unit = {
    val mask = filterType.map(t => RecordType.maskOf(Seq(t)))
      .getOrElse(RecordType.AnyType)
    val t0 = System.nanoTime()
    var n = 0L
    var bytes = 0L
    paths.foreach { p =>
      val (in, _) = open(p)
      val parser = new WarcParser(new WarcByteReader(in), p,
        WarcParseOptions(recordTypeMask = mask, parseHttp = parseHttp))
      try parser.foreach { rec => n += 1; bytes += rec.contentLength }
      finally in.close()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    out.println(f"$n records ($bytes content bytes) in $sec%.3f s = ${n / sec}%.0f records/s")
  }
}
