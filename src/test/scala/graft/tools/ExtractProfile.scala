package graft.tools

/** Dev profiling main (test scope): per-stage timing of the extract path
  * over the fixture's 16 response pages. Run:
  *   sbt "Test/runMain graft.tools.ExtractProfile [reps]"
  */
object ExtractProfile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 200
    val fx = "/root/reference/tests/data/warcfile.warc"
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(fx))
    val it = new graft.core.WarcParser(new graft.core.WarcByteReader(in), fx)
    val pages = it.toVector.filter(_.recordType == "response")
      .flatMap(r => r.http.map(h => (h.body, h.charset.getOrElse(""))))
    in.close()
    println(s"pages=${pages.size} totalBytes=${pages.map(_._1.length).sum}")

    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      f
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      val docs = pages.size * reps
      println(f"$label%-22s ${sec}%7.3fs  ${docs / sec}%9.0f docs/s/core")
    }

    // stage 1: charset resolve + decode
    val decoded = pages.map { case (b, cs) =>
      val enc = Option(cs).filter(_.nonEmpty)
        .flatMap(c => graft.core.Encodings.mapToHtml5(c, fallbackUtf8 = false))
        .orElse(graft.core.Encodings.detectEncoding(b, fromHtmlMeta = true))
        .getOrElse("utf-8")
      graft.core.Encodings.bytesToStr(b, enc)
    }
    val trees = decoded.map(graft.html.HtmlTree.parse(_))

    time("decode(charset+b2s)") {
      var k = 0
      while (k < reps) {
        pages.foreach { case (b, cs) =>
          val enc = Option(cs).filter(_.nonEmpty)
            .flatMap(c => graft.core.Encodings.mapToHtml5(c, fallbackUtf8 = false))
            .orElse(graft.core.Encodings.detectEncoding(b, fromHtmlMeta = true))
            .getOrElse("utf-8")
          graft.core.Encodings.bytesToStr(b, enc)
        }
        k += 1
      }
    }
    time("  detect only") {
      var k = 0
      while (k < reps) {
        pages.foreach { case (b, _) =>
          graft.core.Encodings.detectEncoding(b, fromHtmlMeta = true)
        }
        k += 1
      }
    }
    time("parse") {
      var k = 0
      while (k < reps) { decoded.foreach(graft.html.HtmlTree.parse(_)); k += 1 }
    }
    time("extract(full)") {
      var k = 0
      while (k < reps) {
        trees.foreach(t => graft.html.Html2Text.extract(t,
          graft.html.Html2Text.Options()))
        k += 1
      }
    }
    time("extract(main)") {
      var k = 0
      while (k < reps) {
        trees.foreach(t => graft.html.Html2Text.extract(t,
          graft.html.Html2Text.Options(mainContent = true)))
        k += 1
      }
    }
    time("end-to-end") {
      var k = 0
      while (k < reps) {
        pages.foreach { case (b, cs) =>
          graft.html.Html2Text.extract(graft.html.HtmlTree.parseFromBytes(b, cs),
            graft.html.Html2Text.Options())
        }
        k += 1
      }
    }
    time("extract(streaming)") {
      var k = 0
      while (k < reps) {
        decoded.foreach(h => graft.html.Html2TextStream.extract(h,
          graft.html.Html2Text.Options()))
        k += 1
      }
    }
    time("e2e streaming") {
      var k = 0
      while (k < reps) {
        pages.foreach { case (b, cs) =>
          graft.html.Html2Text.extractFromHtml(
            graft.html.HtmlTree.decodeForParse(b, cs),
            graft.html.Html2Text.Options())
        }
        k += 1
      }
    }
  }
}
