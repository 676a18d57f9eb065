package graft.core

import java.io.OutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.Instant
import java.time.format.DateTimeFormatter

/** WARC serialization — reference `WarcRecord.write`
  * (fastwarc-py/fastwarc/warc.pyx:840-938, record.rs:1206-1332):
  * version line + sanitized headers + CRLF + payload + CRLFCRLF, with
  * Content-Length correction and optional SHA-1 block/payload digest
  * headers; ONE compression member per record on compressed outputs so
  * the archive stays record-addressable (warc.pyx:900-903 —
  * the partition-pruning analog: a CDXJ offset seeks straight to a
  * member boundary).
  */
object WarcWriter {

  sealed trait Codec
  case object Raw extends Codec
  case object Gzip extends Codec
  case object Lz4 extends Codec
  case object Zstd extends Codec

  def codecFor(name: String): Codec = name.toLowerCase match {
    case "gzip" | "gz" => Gzip
    case "lz4" => Lz4
    case "zstd" | "zst" => Zstd
    case _ => Raw
  }

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Serialize one record to `out` (uncompressed bytes). The record's
    * `content` is the full block (HTTP headers included for http
    * records, matching what the scan produces). Returns bytes written.
    */
  def writeRecord(rec: WarcRecord, out: OutputStream,
      checksum: Boolean = false): Long = {
    // header corrections on a copy: Content-Length always, digests opt-in
    var headers = rec.headers.updated("Content-Length", rec.content.length.toString)
    if (headers.get("WARC-Record-ID").isEmpty)
      headers = headers.updated("WARC-Record-ID", s"<urn:uuid:${java.util.UUID.randomUUID()}>")
    if (checksum) {
      val blockDigest = MessageDigest.getInstance("SHA-1").digest(rec.content)
      headers = headers.updated("WARC-Block-Digest", "sha1:" + Digests.base32Encode(blockDigest))
      rec.http.foreach { m =>
        val payloadDigest = MessageDigest.getInstance("SHA-1").digest(m.body)
        headers = headers.updated("WARC-Payload-Digest", "sha1:" + Digests.base32Encode(payloadDigest))
      }
    }

    val sb = new StringBuilder(256)
    // preserve the record's own version line (reference WarcRecord.write
    // keeps the original status line, warc.pyx:840-938) — a WARC/1.0
    // record must not silently upgrade to 1.1 on recompress/round-trip;
    // WARC/1.1 only for records built fresh (no version yet)
    sb.append(if (rec.version.nonEmpty) rec.version else "WARC/1.1").append("\r\n")
    headers.entries.foreach { case (k, v) =>
      sb.append(HeaderMap.sanitizeKey(k)).append(": ")
        .append(HeaderMap.sanitizeValue(v)).append("\r\n")
    }
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    out.write(head)
    out.write(Crlf)
    out.write(rec.content)
    out.write(Crlf); out.write(Crlf)
    head.length + 2L + rec.content.length + 4L
  }

  /** Record construction defaults — reference `init_headers`
    * (warc.pyx:721-757): WARC/1.1, fresh UUID id, UTC now.
    */
  def buildRecord(
      recordType: String,
      content: Array[Byte],
      targetUri: Option[String] = None,
      date: Instant = Instant.now(),
      contentType: Option[String] = None,
      extraHeaders: Seq[(String, String)] = Nil): WarcRecord = {
    val base = Vector(
      "WARC-Type" -> recordType,
      "WARC-Date" -> DateTimeFormatter.ISO_INSTANT.format(date.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)),
      "WARC-Record-ID" -> s"<urn:uuid:${java.util.UUID.randomUUID()}>",
      "Content-Length" -> content.length.toString) ++
      targetUri.map("WARC-Target-URI" -> _) ++
      contentType.map("Content-Type" -> _) ++ extraHeaders
    val headers = HeaderMap(base)
    WarcRecord("", -1L, -1L, headers.get("WARC-Record-ID"), recordType,
      RecordType.mask(recordType), Some(date), content.length.toLong, headers,
      content, None, None)
  }

  private final class CountingOutputStream(under: OutputStream) extends OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
    override def flush(): Unit = under.flush()
    override def close(): Unit = under.close()
  }

  /** Gzip member framing over ONE reused Deflater. A fresh
    * `GZIPOutputStream` per record leaks a native zlib Deflater (~hundreds
    * of KB off-heap) until finalization — member-per-record archives write
    * millions of members, so the deflater must be explicit: reset per
    * member, end() exactly once at close.
    */
  private final class MemberGzip(out: OutputStream) {
    private val deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    private val crc = new java.util.zip.CRC32()
    private val buf = new Array[Byte](64 * 1024)
    private var size = 0L
    // RFC 1952 member header: magic, CM=deflate, no flags/mtime/XFL, OS=unknown
    private val header = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

    private def drain(): Unit = {
      var n = deflater.deflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = deflater.deflate(buf) }
    }

    val memberStream: OutputStream = new OutputStream {
      override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        crc.update(b, off, len)
        size += len
        deflater.setInput(b, off, len)
        while (!deflater.needsInput()) drain()
      }
    }

    def beginMember(): Unit = {
      deflater.reset(); crc.reset(); size = 0L
      out.write(header)
    }

    def finishMember(): Unit = {
      deflater.finish()
      while (!deflater.finished()) drain()
      val trailer = new Array[Byte](8)
      val c = crc.getValue; val s = size & 0xffffffffL
      var i = 0
      while (i < 4) { trailer(i) = ((c >>> (8 * i)) & 0xff).toByte; i += 1 }
      while (i < 8) { trailer(i) = ((s >>> (8 * (i - 4))) & 0xff).toByte; i += 1 }
      out.write(trailer)
    }

    def end(): Unit = deflater.end()
  }

  /** Streaming writer producing one compression member per record.
    * `write` returns the record's FILE offset (compressed coordinates) —
    * the seekable address for [[WarcPointLookup.extract]] / a CDXJ index
    * over compressed archives (the partition-pruning analog,
    * warc.pyx:900-903).
    */
  final class RecordStreamWriter(rawOut0: OutputStream, codec: Codec,
      checksum: Boolean = false, zstdDict: Array[Byte] = null) {
    private val rawOut = new CountingOutputStream(rawOut0)
    private var count = 0L
    private lazy val gzip = new MemberGzip(rawOut)
    private var lz4: Lz4FrameOutputStream = null
    private lazy val zstd = new ZstdMemberWriter(rawOut, dict = zstdDict)
    private var zstdScratch: java.io.ByteArrayOutputStream = null
    def recordsWritten: Long = count
    def bytesWritten: Long = rawOut.count

    def write(rec: WarcRecord): Long = {
      val memberStart = rawOut.count
      codec match {
        case Raw => writeRecord(rec, rawOut, checksum)
        case Gzip =>
          // member per record: a full gzip member finished per record,
          // shared deflater reset between members (no native leak)
          gzip.beginMember()
          writeRecord(rec, gzip.memberStream, checksum)
          gzip.finishMember()
        case Lz4 =>
          // frame per record (the LZ4 analog of member-per-record gzip:
          // seekable boundaries for the member index / point lookup);
          // ONE reusable writer — commons-compress writes at ~0.2 MB/s,
          // and a fresh Lz4FrameOutputStream per record would churn its
          // ~230 KB of buffers per record
          if (lz4 == null) lz4 = new Lz4FrameOutputStream(rawOut)
          else lz4.reset()
          writeRecord(rec, lz4, checksum)
          lz4.finish()
        case Zstd =>
          // frame per record through ONE reused native compress ctx;
          // with a dictionary the skippable dict frame lands first (so
          // the FIRST record's memberStart is past it — which is what a
          // seek needs: the reader preloads the head dict separately)
          if (zstdScratch == null) zstdScratch = new java.io.ByteArrayOutputStream(64 << 10)
          else zstdScratch.reset()
          writeRecord(rec, zstdScratch, checksum)
          zstd.writeDictFrame()
          val dictedStart = rawOut.count // after the dict frame, if any
          zstd.writeFrame(zstdScratch.toByteArray, zstdScratch.size)
          count += 1
          return dictedStart
      }
      count += 1
      memberStart
    }

    /** Finish codec-held native resources without closing the sink. */
    def finishCodecs(): Unit = {
      if (codec == Gzip) gzip.end()
      if (codec == Zstd && count > 0) zstd.close()
    }

    def close(): Unit = {
      finishCodecs()
      rawOut.close()
    }
  }

  /** `recompress_warc` (fastwarc-py/fastwarc/tools.pyx:91-152): stream a
    * whole archive under a new codec; returns (records, bytesRead).
    */
  def recompress(in: java.io.InputStream, out: OutputStream, codec: Codec,
      checksum: Boolean = false): Long = {
    val (stream, _) = WarcCodecs.open(in)
    val parser = new WarcParser(new WarcByteReader(stream), "", WarcParseOptions(parseHttp = false))
    val w = new RecordStreamWriter(out, codec, checksum)
    parser.foreach(w.write)
    w.finishCodecs()
    out.flush()
    w.recordsWritten
  }

  /** Two-pass zstd recompress with a TRAINED dictionary (the wget
    * `.warc.zst`-with-dictionary shape): pass 1 samples each record's
    * serialized bytes and trains a zstd dictionary (ZDICT); pass 2
    * writes the dictionary skippable frame followed by one frame per
    * record compressed against it. Small-record archives compress
    * substantially better this way — shared boilerplate (headers, HTML
    * scaffolding) lands once in the dictionary instead of per frame.
    * `reopen` must yield a fresh stream over the same archive; returns
    * (records written, trained dictionary size — None when zstd
    * declined to train and the archive was written dictionary-less).
    */
  /** Stage 1 of the dictionary lifecycle on its own (CLI `dict-train`,
    * the sink's `zstd_dict` option, w50): sample the archive's first
    * records in their serialized WARC form — the exact bytes the zstd
    * frames will compress — and train a shared dictionary. None when
    * zstd declines (too few / too uniform samples); callers then write
    * dictionary-less, which every reader handles. At 100 TB the shape
    * is train-once-reuse-everywhere: one sample pass over one shard,
    * the dictionary artifact broadcast to every writer.
    */
  def trainDictionary(reopen: () => java.io.InputStream,
      checksum: Boolean = false, maxSamples: Int = 256,
      dictSize: Int = 0): Option[Array[Byte]] = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var sampleBytes = 0L
    val in = reopen()
    try {
      val (stream, _) = WarcCodecs.open(in)
      val parser = new WarcParser(new WarcByteReader(stream), "",
        WarcParseOptions(parseHttp = false))
      val buf = new java.io.ByteArrayOutputStream(64 << 10)
      val it = parser
      while (it.hasNext && samples.length < maxSamples && sampleBytes < (32L << 20)) {
        buf.reset()
        writeRecord(it.next(), buf, checksum)
        samples += buf.toByteArray
        sampleBytes += buf.size
      }
    } finally in.close()
    ZstdDict.train(samples.toSeq, dictSize)
  }

  def recompressZstdTrained(reopen: () => java.io.InputStream,
      out: OutputStream, checksum: Boolean = false,
      maxSamples: Int = 256): (Long, Option[Int]) = {
    val dict = trainDictionary(reopen, checksum, maxSamples)
    val in2 = reopen()
    try {
      val (stream, _) = WarcCodecs.open(in2)
      val parser = new WarcParser(new WarcByteReader(stream), "",
        WarcParseOptions(parseHttp = false))
      val w = new RecordStreamWriter(out, Zstd, checksum, zstdDict = dict.orNull)
      parser.foreach(w.write)
      w.finishCodecs()
      out.flush()
      (w.recordsWritten, dict.map(_.length))
    } finally in2.close()
  }
}

/** Point lookup: seek to a byte offset (compressed coordinates for
  * member-per-record archives — as produced by the writer or a CDXJ
  * index) and read exactly one record (reference `extract`,
  * fastwarc-py/fastwarc/cli.py:185-222).
  */
object WarcPointLookup {
  def extract(path: String, offset: Long,
      opts: WarcParseOptions = WarcParseOptions()): Option[WarcRecord] = {
    // dict-led `.warc.zst`: a mid-archive frame decodes only against
    // the head dictionary — probe the file head for one before seeking
    // (one bounded read; None for every other codec/convention)
    val headDict: Option[Array[Byte]] =
      if (offset > 0) {
        val probe = new java.io.FileInputStream(path)
        try ZstdWarc.readDictionary(
          new java.io.BufferedInputStream(probe, 64 * 1024))
        finally probe.close()
      } else None
    val raw = new java.io.FileInputStream(path)
    try {
      if (offset > 0) {
        var left = offset
        while (left > 0) {
          val skipped = raw.skip(left)
          if (skipped <= 0) return None
          left -= skipped
        }
      }
      val stream = headDict match {
        case Some(d) => new ZstdFrameInputStream(
          new java.io.BufferedInputStream(raw, 64 * 1024), presetDict = d)
        case None => WarcCodecs.open(raw)._1
      }
      val parser = new WarcParser(new WarcByteReader(stream), path, opts)
      if (parser.hasNext) Some(parser.next()) else None
    } finally raw.close()
  }

  /** Batched point lookup over ONE archive: open the file once, probe
    * the head dictionary once, and serve the offsets in ascending order
    * through forward seeks on a single FileChannel — the shape a
    * million-hit CDXJ resolution wants (per-hit `extract` re-opens the
    * file and, for trained-dict `.warc.zst`, re-reads and re-loads the
    * dictionary on every call). Results are returned keyed by offset;
    * a missing/garbage offset maps to None, never a failure (exc_loop
    * doctrine). Duplicate offsets are served once.
    */
  /** [[extractAll]] through the Hadoop FileSystem layer — the CLUSTER
    * form: `fs.open` once per archive, `FSDataInputStream.seek` per hit
    * (on s3a each forward seek is a ranged GET reposition), ONE head-
    * dictionary probe. This is what a CDXJ resolution against an
    * object-store collection actually issues; the local overload below
    * keeps the FileChannel fast path for `file:` archives.
    */
  def extractAllFs(path: org.apache.hadoop.fs.Path, offsets: Seq[Long],
      opts: WarcParseOptions,
      conf: org.apache.hadoop.conf.Configuration)
      : Map[Long, Option[WarcRecord]] = {
    if (offsets.isEmpty) return Map.empty
    val sorted = offsets.distinct.sorted
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val shield = new java.io.FilterInputStream(in) {
        override def close(): Unit = ()
      }
      val headDict: Option[Array[Byte]] =
        if (sorted.exists(_ > 0))
          ZstdWarc.readDictionary(
            new java.io.BufferedInputStream(shield, 64 * 1024))
        else None
      // explicit bound for the LAST hit: the archive's length (one
      // getFileStatus RPC per group) — without it the final member's
      // read runs through the unbounded stream and decoder read-ahead
      // may stream past it toward EOF on an object store, partially
      // defeating member-sized point reads (ADVICE r16). Unavailable
      // length (racing delete) falls back to unbounded: the Try below
      // already owns per-hit failure.
      val fileLen: Long =
        try fs.getFileStatus(path).getLen
        catch { case _: java.io.IOException => Long.MaxValue }
      sorted.iterator.zipWithIndex.map { case (off, i) =>
        off -> (scala.util.Try {
          in.seek(off)
          // bound each hit's read at the NEXT indexed member start (file
          // length for the last hit): the member at `off` ends at or
          // before any later member boundary, so on an object store a
          // point read costs member-sized bytes, never the decoder's
          // full read-ahead past it
          val boundAt = if (i + 1 < sorted.length) sorted(i + 1) else fileLen
          val bounded: java.io.InputStream =
            if (boundAt > off && boundAt != Long.MaxValue)
              org.apache.commons.io.input.BoundedInputStream.builder()
                .setInputStream(shield)
                .setMaxCount(boundAt - off)
                .setPropagateClose(false).get()
            else shield
          val stream = headDict match {
            case Some(d) => new ZstdFrameInputStream(
              new java.io.BufferedInputStream(bounded, 64 * 1024), presetDict = d)
            case None => WarcCodecs.open(bounded)._1
          }
          val parser = new WarcParser(
            new WarcByteReader(stream), path.toString, opts)
          if (parser.hasNext) Some(parser.next()) else None
        }.toOption.flatten)
      }.toMap
    } finally in.close()
  }

  def extractAll(path: String, offsets: Seq[Long],
      opts: WarcParseOptions = WarcParseOptions())
      : Map[Long, Option[WarcRecord]] = {
    if (offsets.isEmpty) return Map.empty
    val sorted = offsets.distinct.sorted
    val headDict: Option[Array[Byte]] =
      if (sorted.exists(_ > 0)) {
        val probe = new java.io.FileInputStream(path)
        try ZstdWarc.readDictionary(
          new java.io.BufferedInputStream(probe, 64 * 1024))
        finally probe.close()
      } else None
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path), java.nio.file.StandardOpenOption.READ)
    try {
      sorted.iterator.map { off =>
        off -> (scala.util.Try {
          ch.position(off)
          val raw = java.nio.channels.Channels.newInputStream(ch)
          // never let the per-record decoder chain close the channel —
          // the next offset reuses it
          val shield = new java.io.FilterInputStream(raw) {
            override def close(): Unit = ()
          }
          val stream = headDict match {
            case Some(d) => new ZstdFrameInputStream(
              new java.io.BufferedInputStream(shield, 64 * 1024), presetDict = d)
            case None => WarcCodecs.open(shield)._1
          }
          val parser = new WarcParser(new WarcByteReader(stream), path, opts)
          if (parser.hasNext) Some(parser.next()) else None
        }.toOption.flatten)
      }.toMap
    } finally ch.close()
  }
}
