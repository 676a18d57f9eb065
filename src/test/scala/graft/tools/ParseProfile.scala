package graft.tools

/** Dev: JFR-friendly parse-only loop for hot-method profiling.
  *   sbt "Test/runMain graft.tools.ParseProfile [seconds]"
  */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val seconds = if (args.nonEmpty) args(0).toInt else 20
    val fx = "/root/reference/tests/data/warcfile.warc"
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(fx))
    val it = new graft.core.WarcParser(new graft.core.WarcByteReader(in), fx)
    val pages = it.toVector.filter(_.recordType == "response")
      .flatMap(r => r.http.map(h => (h.body, h.charset.getOrElse(""))))
    in.close()
    val decoded = pages.map { case (b, cs) =>
      val enc = Option(cs).filter(_.nonEmpty)
        .flatMap(c => graft.core.Encodings.mapToHtml5(c, fallbackUtf8 = false))
        .orElse(graft.core.Encodings.detectEncoding(b, fromHtmlMeta = true))
        .getOrElse("utf-8")
      graft.core.Encodings.bytesToStr(b, enc)
    }
    // warmup
    (0 until 50).foreach(_ => decoded.foreach(graft.html.HtmlTree.parse(_)))
    val t0 = System.nanoTime()
    var docs = 0L
    while ((System.nanoTime() - t0) / 1e9 < seconds) {
      decoded.foreach(graft.html.HtmlTree.parse(_))
      docs += decoded.size
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"parse: $docs docs in $sec%.1fs = ${docs / sec}%.0f docs/s/core")
  }
}
