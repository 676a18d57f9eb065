package graft.tools

import graft.core.{WarcByteReader, WarcCodecs, WarcParseOptions, WarcParser, ZstdFrameInputStream}

/** Dev harness for the zstd codec-bound certification (round-14 verdict
  * item 2): measures, over the SAME cached corpus file the bench's
  * `scan_zstd_rps` row reads,
  *   codec  — raw zstd-jni streaming decode (no frame walk, no parse)
  *   frame  — [[ZstdFrameInputStream]] (this engine's frame walk +
  *            one-shot per-frame decode), no WARC parse
  *   full   — frame walk + WARC envelope parse (= the scan row's path)
  * in decompressed MB/s, max-of-3 windows each, plus the derived
  * records/s. Run: `sbt "runMain graft.tools.ZstdBound"`.
  */
object ZstdBound {
  def main(args: Array[String]): Unit = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.BenchCorpus.ensureZstd(s"$tmp/graft_warc_bench_zstd", 2, 20)
    val dir = new java.io.File(s"$tmp/graft_warc_bench_zstd")
    val zf = dir.listFiles().filter(_.getName.endsWith(".warc.zst")).minBy(_.getName)
    val comp = java.nio.file.Files.readAllBytes(zf.toPath)
    val sink = new Array[Byte](1 << 20)
    def drain(mk: () => java.io.InputStream): Long = {
      val z = mk()
      var total = 0L
      var n = z.read(sink)
      while (n >= 0) { total += n; n = z.read(sink) }
      z.close(); total
    }
    def rate(label: String)(pass: () => Long): Double = {
      pass(); pass() // warm
      def once(): Double = {
        var bytes = 0L
        val t0 = System.nanoTime()
        while ((System.nanoTime() - t0) / 1e9 < 0.8) bytes += pass()
        bytes / 1e6 / ((System.nanoTime() - t0) / 1e9)
      }
      val r = Seq(once(), once(), once()).max
      println(f"$label%-8s $r%8.0f MB/s")
      r
    }
    val decompTotal = drain(() => new ZstdFrameInputStream(
      new java.io.ByteArrayInputStream(comp)))
    var records = 0L
    val codec = rate("codec")(() => drain(() =>
      new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(comp))))
    val frame = rate("frame")(() => drain(() =>
      new ZstdFrameInputStream(new java.io.ByteArrayInputStream(comp))))
    val full = rate("full") { () =>
      val (in, _) = WarcCodecs.open(new java.io.ByteArrayInputStream(comp))
      val p = new WarcParser(new WarcByteReader(in), zf.getName,
        WarcParseOptions(parseHttp = false, readPayload = false))
      records = 0L
      try { while (p.hasNext) { p.next(); records += 1 } } finally in.close()
      decompTotal
    }
    val rps = full * 1e6 / decompTotal * records
    println(f"file=${zf.getName} comp=${comp.length / 1e6}%.1f MB decomp=${decompTotal / 1e6}%.1f MB records=$records")
    println(f"ratio codec/frame=${codec / frame}%.2f  codec/full=${codec / full}%.2f  -> scan ~${rps}%.0f rec/s")

    // ---- composition-bound decomposition (r15 verdict item 4) ----
    // parse: WarcParser over the DECOMPRESSED bytes in memory — the pure
    // envelope-parse cost with a zero-cost "codec". If
    // (1/full − 1/frame) ≈ (1/parse − memcpy), the full reader is the
    // exact composition of its two stages and no reader overhead is
    // left to cut.
    val decomp = new java.io.ByteArrayOutputStream(decompTotal.toInt)
    locally {
      val z = new ZstdFrameInputStream(new java.io.ByteArrayInputStream(comp))
      val buf = new Array[Byte](1 << 16)
      var n = z.read(buf)
      while (n >= 0) { decomp.write(buf, 0, n); n = z.read(buf) }
      z.close()
    }
    val decompBytes = decomp.toByteArray
    val parse = rate("parse") { () =>
      val p = new WarcParser(
        new WarcByteReader(new java.io.ByteArrayInputStream(decompBytes)),
        zf.getName, WarcParseOptions(parseHttp = false, readPayload = false))
      var r = 0L
      while (p.hasNext) { p.next(); r += 1 }
      decompTotal
    }
    // decompTotal bytes / (MB/s) = µs; /records = µs per record
    val gapUs = (decompTotal / full - decompTotal / frame) / records
    val parseUs = decompTotal / parse / records
    println(f"decomposition: full-frame gap=${gapUs}%.2f us/rec  " +
      f"pure-parse=${parseUs}%.2f us/rec  ratio=${gapUs / parseUs}%.2f " +
      "(≈1.0 ⇒ composition-bound)")

    // ---- overlap prototype: decode thread feeds parse thread through
    // a bounded 2-slot chunk queue (the verdict's "decompress member
    // i+1 while parsing i", generalized to 64 KiB chunks). Measured,
    // then kept or rejected on the numbers — single-stream first, then
    // a 32-way aggregate (the scan's real regime at local[32], where an
    // extra decode thread per task oversubscribes the host).
    def asyncFull(): Long = {
      val (in0, _) = WarcCodecs.open(new java.io.ByteArrayInputStream(comp))
      val in = new graft.core.AsyncChunkInputStream(in0)
      val p = new WarcParser(new WarcByteReader(in), zf.getName,
        WarcParseOptions(parseHttp = false, readPayload = false))
      try { while (p.hasNext) p.next() } finally in.close()
      decompTotal
    }
    val async1 = rate("async1")(() => asyncFull())
    def aggregate(mk: () => Long, threads: Int): Double = {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bytes = new java.util.concurrent.atomic.AtomicLong(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      (0 until threads).foreach(_ => pool.submit(new Runnable {
        override def run(): Unit =
          while (!stop.get()) bytes.addAndGet(mk())
      }))
      Thread.sleep(1500)
      stop.set(true)
      pool.shutdown()
      pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
      bytes.get() / 1e6 / ((System.nanoTime() - t0) / 1e9)
    }
    def fullSync(): Long = {
      val (in, _) = WarcCodecs.open(new java.io.ByteArrayInputStream(comp))
      val p = new WarcParser(new WarcByteReader(in), zf.getName,
        WarcParseOptions(parseHttp = false, readPayload = false))
      try { while (p.hasNext) p.next() } finally in.close()
      decompTotal
    }
    // interleaved to share the host window
    val agg32s1 = aggregate(() => fullSync(), 32)
    val agg32a1 = aggregate(() => asyncFull(), 32)
    val agg32s2 = aggregate(() => fullSync(), 32)
    val agg32a2 = aggregate(() => asyncFull(), 32)
    val aggSync = math.max(agg32s1, agg32s2)
    val aggAsync = math.max(agg32a1, agg32a2)
    println(f"async single-stream: $async1%8.0f MB/s (~${async1 * 1e6 / decompTotal * records}%.0f rec/s, " +
      f"sync was $full%.0f MB/s)")
    println(f"32-way aggregate: sync=$aggSync%8.0f MB/s  async=$aggAsync%8.0f MB/s  " +
      f"(async/sync ${aggAsync / aggSync}%.2f)")
  }
}
