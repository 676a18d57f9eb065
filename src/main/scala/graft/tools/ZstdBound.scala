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
  }
}
