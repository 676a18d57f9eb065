package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic multi-file WARC bench corpus: N files, each `copies`
  * back-to-back copies of the 50-record fixture archive. Concatenating
  * gzip archives is valid multi-member gzip (the reference writes one
  * member per record for exactly this reason), so each output file is a
  * well-formed WARC with copies*50 records.
  *
  * This makes the BASELINE gzip-scan throughput (~10.4k records/s/core,
  * BASELINE.md) measurable: w17/w18 scan this corpus and their bench
  * timings give records/s.
  */
object BenchCorpus {

  val FixtureGz = "/root/reference/tests/data/warcfile.warc.gz"
  /** The same 50 records, uncompressed / LZ4-framed (the reference ships
    * all three; its benchmark table times each codec separately).
    * Concatenation is valid for all three containers: multi-member gzip,
    * back-to-back LZ4 frames (the reader opens with
    * decompressConcatenated), and plain WARC record streams.
    */
  val FixtureRaw = "/root/reference/tests/data/warcfile.warc"
  val FixtureLz4 = "/root/reference/tests/data/warcfile.warc.lz4"
  val RecordsPerCopy = 50

  /** Writer-unique temp path: two JVMs racing the same ensure (the
    * synchronized blocks are per-JVM only) must never interleave writes
    * into ONE tmp file — a fixed tmp name lets one JVM atomically
    * promote the OTHER's partially written bytes. pid + nano suffix
    * gives each writer its own tmp; the atomic move stays the commit.
    */
  private def tmpFor(d: java.nio.file.Path, name: String): java.nio.file.Path = {
    sweepStaleTmps(d)
    d.resolve(s".$name.${ProcessHandle.current.pid}-${System.nanoTime()}.tmp")
  }

  /** Unique tmp names never collide, so a crashed writer's tmp is no
    * longer self-healed by the next REPLACE_EXISTING — sweep dot-tmp
    * debris older than an hour (never a LIVE writer's file: any
    * in-flight ensure finishes in seconds).
    */
  private def sweepStaleTmps(d: java.nio.file.Path): Unit = {
    if (!Files.isDirectory(d)) return
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val listing = Files.list(d)
    try listing.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith(".") && n.endsWith(".tmp") &&
          (scala.util.Try(Files.getLastModifiedTime(p).toMillis)
            .getOrElse(Long.MaxValue) < cutoff))
        scala.util.Try(Files.delete(p))
    } finally listing.close()
  }

  /** Create (once) and return the corpus directory. */
  def ensure(dir: String, files: Int = 10, copiesPerFile: Int = 20): String =
    ensureFrom(dir, files, copiesPerFile, FixtureGz, ".warc.gz")

  private def ensureFrom(dir: String, files: Int, copiesPerFile: Int,
      srcPath: String, ext: String): String =
    synchronized {
      val d = Paths.get(dir)
      val marker = d.resolve(s"READY-$files-$copiesPerFile")
      if (Files.exists(marker)) return dir
      Files.createDirectories(d)
      // A shape change (different files/copies) regenerates only its own
      // file range — stale bench-* files from a LARGER previous shape
      // would survive and silently inflate every record count, so clear
      // any prior generation (markers included) before writing.
      val stale = Files.list(d)
      try stale.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("bench-") || n.startsWith("READY-")) Files.delete(p)
      } finally stale.close()
      val src = Files.readAllBytes(Paths.get(srcPath))
      (0 until files).foreach { i =>
        val tmp = tmpFor(d, s"part-$i")
        val out = Files.newOutputStream(tmp)
        try (0 until copiesPerFile).foreach(_ => out.write(src))
        finally out.close()
        Files.move(tmp, d.resolve(f"bench-$i%03d$ext"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(marker, Array.emptyByteArray)
      dir
    }

  /** Uncompressed variant of [[ensure]] (BASELINE.md's 108k records/s
    * row — the no-decompression scan ceiling).
    */
  def ensureUncompressed(dir: String, files: Int, copiesPerFile: Int): String =
    ensureFrom(dir, files, copiesPerFile, FixtureRaw, ".warc")

  /** LZ4 variant of [[ensure]] (BASELINE.md's 49.8k records/s row). */
  def ensureLz4(dir: String, files: Int, copiesPerFile: Int): String =
    ensureFrom(dir, files, copiesPerFile, FixtureLz4, ".warc.lz4")

  /** `.warc.zst` variant: the fixture recompressed frame-per-record
    * once (cached beside the corpus), then concatenated like the
    * others — concatenated zstd frame chains are legal archives.
    * No reference row exists for zstd (fastwarc has no zstd); the
    * bench reports it as an extra informational column.
    */
  def ensureZstd(dir: String, files: Int, copiesPerFile: Int): String = synchronized {
    val d = Paths.get(dir)
    val zstFixture = d.resolve("fixture.warc.zst")
    if (!Files.exists(zstFixture)) {
      Files.createDirectories(d)
      val out = new java.io.ByteArrayOutputStream()
      val in = new java.io.FileInputStream(FixtureGz)
      try graft.core.WarcWriter.recompress(in, out, graft.core.WarcWriter.Zstd)
      finally in.close()
      // tmp + atomic move (same pattern as ensureFrom/ensureTextFixture):
      // a crash or a second JVM racing this write (synchronized is
      // per-JVM only) must not leave a truncated cached fixture that
      // poisons every later bench/scale run
      val tmp = tmpFor(d, "fixture.warc.zst")
      Files.write(tmp, out.toByteArray)
      Files.move(tmp, zstFixture, StandardCopyOption.REPLACE_EXISTING)
    }
    ensureFrom(dir, files, copiesPerFile, zstFixture.toString, ".warc.zst")
  }

  def totalRecords(files: Int = 10, copiesPerFile: Int = 20): Long =
    files.toLong * copiesPerFile * RecordsPerCopy

  /** Deterministic line-oriented text fixture for the ReadFromText
    * analog (w21): 1000 lines `line-<i>`.
    */
  def ensureTextFixture(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("lines.txt")
    if (!Files.exists(f)) {
      Files.createDirectories(d)
      val tmp = tmpFor(d, "lines.txt")
      val sb = new StringBuilder
      (0 until 1000).foreach(i => sb.append("line-").append(i).append('\n'))
      Files.write(tmp, sb.toString.getBytes("ascii"))
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  /** Member-per-record gzip archive of the fixture plus the writer's
    * reported member offsets (sidecar), for the point-lookup oracle
    * (w22). Returns (archive path, member offsets).
    */
  def ensureMemberArchive(dir: String): (String, Seq[Long]) = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("members.warc.gz")
    val side = d.resolve("members.offsets")
    if (!Files.exists(side)) {
      Files.createDirectories(d)
      val in = Files.newInputStream(Paths.get(FixtureGz))
      val (stream, _) = graft.core.WarcCodecs.open(in)
      val parser = new graft.core.WarcParser(
        new graft.core.WarcByteReader(stream), "",
        graft.core.WarcParseOptions(parseHttp = false))
      val tmp = tmpFor(d, "members.warc.gz")
      val out = Files.newOutputStream(tmp)
      val w = new graft.core.WarcWriter.RecordStreamWriter(
        out, graft.core.WarcWriter.Gzip)
      val offsets = try parser.map(w.write).toVector finally { w.close(); in.close() }
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
      Files.write(side, offsets.mkString("\n").getBytes("ascii"))
    }
    val offsets = new String(Files.readAllBytes(side), "ascii")
      .split('\n').toSeq.filter(_.nonEmpty).map(_.toLong)
    (f.toString, offsets)
  }

  /** Collection of the SAME 50 fixture records re-membered once per
    * seekable container (raw / member-per-record gzip / frame-per-record
    * LZ4 / frame-per-record zstd / trained-dictionary zstd) — the
    * multi-archive multi-codec corpus behind the collection-level CDXJ
    * lookup-join query (w49). Brotli is deliberately absent from the
    * POINT-READ side: an RFC 7932 stream has no member boundaries to
    * seek (and no writer exists anywhere for it), so brotli archives
    * are scannable (w05) but not point-readable — documented at the
    * query. Returns the five archive paths.
    */
  def ensureCollection(dir: String): Seq[String] = synchronized {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    def build(name: String)(write: java.io.OutputStream => Unit): String = {
      val f = d.resolve(name)
      if (!Files.exists(f)) {
        val bos = new java.io.ByteArrayOutputStream()
        write(bos)
        val tmp = tmpFor(d, name)
        Files.write(tmp, bos.toByteArray)
        Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
      }
      f.toString
    }
    import graft.core.WarcWriter
    val plain = Seq[(String, WarcWriter.Codec)](
      ("collection-raw.warc", WarcWriter.Raw),
      ("collection-gzip.warc.gz", WarcWriter.Gzip),
      ("collection-lz4.warc.lz4", WarcWriter.Lz4),
      ("collection-zstd.warc.zst", WarcWriter.Zstd)
    ).map { case (name, codec) =>
      build(name) { bos =>
        val in = Files.newInputStream(Paths.get(FixtureGz))
        try WarcWriter.recompress(in, bos, codec)
        finally in.close()
      }
    }
    val dict = build("collection-dict.warc.zst") { bos =>
      WarcWriter.recompressZstdTrained(
        () => Files.newInputStream(Paths.get(FixtureGz)), bos)
    }
    plain :+ dict
  }

  /** Deliberately damaged raw archive for the resilience oracle (w25):
    * inter-record garbage lines (must be skipped silently, reference
    * resync warc.pyx:1184-1207) and a final record truncated mid-payload
    * (must surface as an error row, exc_loop doctrine). Built
    * deterministically from the fixture so the oracle's totals are
    * independently known.
    */
  def ensureCorrupted(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("corrupted.warc")
    if (!Files.exists(f)) {
      Files.createDirectories(d)
      val in = Files.newInputStream(Paths.get(FixtureGz))
      val (stream, _) = graft.core.WarcCodecs.open(in)
      val parser = new graft.core.WarcParser(
        new graft.core.WarcByteReader(stream), "",
        graft.core.WarcParseOptions(parseHttp = false))
      // serialize each record individually (raw codec) to splice bytes
      val serialized = try parser.map { rec =>
        val bos = new java.io.ByteArrayOutputStream()
        val w = new graft.core.WarcWriter.RecordStreamWriter(
          bos, graft.core.WarcWriter.Raw)
        w.write(rec); w.close()
        bos.toByteArray
      }.toVector finally in.close()
      val out = new java.io.ByteArrayOutputStream()
      serialized.take(10).foreach(out.write)
      out.write("#garbage, not a WARC line\r\nstill not one\r\n".getBytes("ascii"))
      serialized.slice(10, 49).foreach(out.write)
      // final record: keep the full header block plus 10 payload bytes
      val last = serialized(49)
      val headerEnd = {
        var i = 0
        var at = -1
        while (at < 0 && i < last.length - 3) {
          if (last(i) == '\r' && last(i + 1) == '\n' &&
              last(i + 2) == '\r' && last(i + 3) == '\n') at = i + 4
          i += 1
        }
        require(at > 0, "no header terminator in serialized record")
        at
      }
      out.write(last, 0, headerEnd + 10)
      val tmp = d.resolve(".corrupted.tmp")
      Files.write(tmp, out.toByteArray)
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  /** Fixture archive recompressed gzip -> LZ4 (`recompress_warc`, w23). */
  def ensureRecompressed(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("recompressed.warc.lz4")
    if (!Files.exists(f)) {
      Files.createDirectories(d)
      val tmp = d.resolve(".recompressed.tmp")
      val in = Files.newInputStream(Paths.get(FixtureGz))
      val out = Files.newOutputStream(tmp)
      try graft.core.WarcWriter.recompress(in, out, graft.core.WarcWriter.Lz4)
      finally { out.close(); in.close() }
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  /** Materialize the brotli-compressed fixture archive (a resource — the
    * reference's fixture dir is read-only) so the `warc` source can scan
    * it by path; returns the file path.
    */
  /** Single recompressed `.warc.zst` fixture (for the w05 five-codec
    * equivalence query; trained-dict variants are exercised by w48 and
    * the spec suite).
    */
  def ensureZstdFixture(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("warcfile.warc.zst")
    if (!Files.exists(f)) {
      Files.createDirectories(d)
      val out = new java.io.ByteArrayOutputStream()
      val in = new java.io.FileInputStream(FixtureGz)
      try graft.core.WarcWriter.recompress(in, out, graft.core.WarcWriter.Zstd)
      finally in.close()
      val tmp = d.resolve(".warcfile.warc.zst.tmp")
      Files.write(tmp, out.toByteArray)
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  def ensureBrotliFixture(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val f = d.resolve("warcfile.warc.br")
    if (!Files.exists(f)) {
      Files.createDirectories(d)
      val in = getClass.getResourceAsStream("/graft/warcfile.warc.br")
      require(in != null, "missing warcfile.warc.br resource")
      val bytes = try in.readAllBytes() finally in.close()
      val tmp = d.resolve(".warcfile.warc.br.tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  // — encoded-bodies fixture (w20): gzip / deflate / chunked+gzip / br —

  private def gz(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(data); d.close()
    bos.toByteArray
  }

  /** Chunked transfer encoding split into two chunks. */
  private def chunk(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val half = data.length / 2
    def one(off: Int, len: Int): Unit = {
      bos.write(s"${len.toHexString}\r\n".getBytes("ascii"))
      bos.write(data, off, len)
      bos.write("\r\n".getBytes("ascii"))
    }
    one(0, half); one(half, data.length - half)
    bos.write("0\r\n\r\n".getBytes("ascii"))
    bos.toByteArray
  }

  private def httpResponse(body: Array[Byte], extraHeaders: Seq[String]): Array[Byte] = {
    val head = (Seq("HTTP/1.1 200 OK", "Content-Type: text/plain") ++
      extraHeaders :+ s"Content-Length: ${body.length}").mkString("", "\r\n", "\r\n\r\n")
    head.getBytes("ascii") ++ body
  }

  /** Fixture WARC whose response bodies exercise every decode-chain step
    * (reference auto_decode, warc.pyx:785-837): gzip, deflate,
    * chunked-then-gzip, and brotli (from-scratch [[graft.core.Brotli]]).
    * Plaintexts are `repeat`-constructions an oracle can recompute.
    */
  def ensureEncodedBodies(dir: String): String = synchronized {
    val d = Paths.get(dir)
    val marker = d.resolve("READY-v2") // v2: real brotli body
    if (Files.exists(marker)) return dir
    Files.createDirectories(d)
    val date = java.time.Instant.parse("2020-08-08T16:00:00Z")
    val recs = Seq(
      ("gzip", httpResponse(gz(("gzip body content. " * 50).getBytes("ascii")),
        Seq("Content-Encoding: gzip"))),
      ("deflate", httpResponse(deflate(("deflate payload x. " * 40).getBytes("ascii")),
        Seq("Content-Encoding: deflate"))),
      ("chunked-gzip", httpResponse(chunk(gz(("chunked then gzip. " * 30).getBytes("ascii"))),
        Seq("Content-Encoding: gzip", "Transfer-Encoding: chunked"))),
      // real brotli stream of "brotli body payload. " x 45 (pre-compressed
      // with the reference C encoder at q9; the JVM side only decodes)
      ("br", httpResponse(java.util.Base64.getDecoder.decode(
        "G7ADAMRtbF3Han6lEwRGdIoKo5pVra8Lcj6G32YGAA=="),
        Seq("Content-Encoding: br"))))
    val tmp = d.resolve(".encoded.tmp")
    val out = Files.newOutputStream(tmp)
    val w = new graft.core.WarcWriter.RecordStreamWriter(out, graft.core.WarcWriter.Gzip)
    try recs.foreach { case (label, content) =>
      w.write(graft.core.WarcWriter.buildRecord("response", content,
        targetUri = Some(s"http://example.com/$label"), date = date,
        contentType = Some("application/http; msgtype=response")))
    } finally { w.close() }
    Files.move(tmp, d.resolve("encoded.warc.gz"), StandardCopyOption.REPLACE_EXISTING)
    Files.write(marker, Array.emptyByteArray)
    dir
  }
}
