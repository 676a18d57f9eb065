package graft.tools

import java.io.{BufferedInputStream, FileInputStream}

/** Dev: single-thread breakdown of the gzip WARC scan path. */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val f = s"${System.getProperty("java.io.tmpdir")}/graft_warc_bench/bench-000.warc.gz"
    graft.sources.BenchCorpus.ensure(
      s"${System.getProperty("java.io.tmpdir")}/graft_warc_bench", 32, 50)
    val reps = if (args.nonEmpty) args(0).toInt else 3
    def time(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      var units = 0L
      (0 until reps).foreach(_ => units = body)
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$label%-28s ${sec}%7.3fs  ${units / sec}%10.0f units/s")
    }
    time("gunzip only (bytes)") {
      val (in, _) = graft.core.WarcCodecs.open(
        new FileInputStream(f))
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) { total += n; n = in.read(buf) }
      in.close()
      total
    }
    time("envelope scan (records)") {
      val (in, _) = graft.core.WarcCodecs.open(new FileInputStream(f))
      val p = new graft.core.WarcParser(new graft.core.WarcByteReader(in), f,
        graft.core.WarcParseOptions(parseHttp = false, readPayload = false))
      var n = 0L
      while (p.hasNext) { p.next(); n += 1 }
      in.close()
      n
    }
    time("envelope + http (records)") {
      val (in, _) = graft.core.WarcCodecs.open(new FileInputStream(f))
      val p = new graft.core.WarcParser(new graft.core.WarcByteReader(in), f,
        graft.core.WarcParseOptions(parseHttp = true))
      var n = 0L
      while (p.hasNext) { p.next(); n += 1 }
      in.close()
      n
    }
  }
}

/** Same scan on N concurrent threads — isolates all-core contention. */
object ScanProfilePar {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 16
    val f = s"${System.getProperty("java.io.tmpdir")}/graft_warc_bench/bench-000.warc.gz"
    def scanOnce(): Long = {
      val (in, _) = graft.core.WarcCodecs.open(new java.io.FileInputStream(f))
      val p = new graft.core.WarcParser(new graft.core.WarcByteReader(in), f,
        graft.core.WarcParseOptions(parseHttp = false, readPayload = false))
      var n = 0L
      while (p.hasNext) { p.next(); n += 1 }
      in.close(); n
    }
    scanOnce() // warm
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => { scanOnce(); () })
      t.start(); t
    }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$threads threads: wall ${sec}%.3fs -> ${threads * 5000 / sec}%.0f rec/s aggregate, ${5000 / sec}%.0f rec/s/core")
  }
}

/** Envelope-scan records/s for each codec corpus file, single thread —
  * the directly comparable numbers for BASELINE.md's three scan rows
  * (uncompressed 108,487 / gzip 10,413 / LZ4 49,825 records/s).
  */
object ScanProfileCodecs {
  def main(args: Array[String]): Unit = {
    val tmp = System.getProperty("java.io.tmpdir")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val files = Seq(
      "uncompressed" -> (graft.sources.BenchCorpus.ensureUncompressed(
        s"$tmp/graft_warc_bench_raw", 32, 50) + "/bench-000.warc"),
      "gzip" -> (graft.sources.BenchCorpus.ensure(
        s"$tmp/graft_warc_bench", 32, 50) + "/bench-000.warc.gz"),
      "lz4" -> (graft.sources.BenchCorpus.ensureLz4(
        s"$tmp/graft_warc_bench_lz4", 32, 50) + "/bench-000.warc.lz4"))
    def scan(f: String): Long = {
      val (in, _) = graft.core.WarcCodecs.open(new FileInputStream(f))
      val p = new graft.core.WarcParser(new graft.core.WarcByteReader(in), f,
        graft.core.WarcParseOptions(parseHttp = false, readPayload = false))
      var n = 0L
      while (p.hasNext) { p.next(); n += 1 }
      in.close()
      n
    }
    files.foreach { case (label, f) =>
      var n = scan(f) // warm + count
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => n = scan(f))
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$label%-14s ${n}%6d records ${sec}%7.3fs  ${n / sec}%9.0f records/s (1 thread)")
    }
  }
}
