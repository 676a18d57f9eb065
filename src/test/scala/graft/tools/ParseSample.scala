package graft.tools
object ParseSample {
  def main(args: Array[String]): Unit = {
    val pages = {
      val (in, _) = graft.core.WarcCodecs.open(new java.io.FileInputStream("/root/reference/tests/data/warcfile.warc.gz"))
      val recs = new graft.core.WarcParser(new graft.core.WarcByteReader(in), "f").toVector
      recs.filter(_.recordType == "response").flatMap(_.http).map(_.body)
        .filter(_.nonEmpty)
        .map(b => graft.html.HtmlTree.decodeForParse(b))
    }
    println(s"pages=${pages.size}")
    // warm
    var i = 0
    while (i < 300) { pages.foreach(p => graft.html.HtmlParser.parse(p)); i += 1 }
    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val sampler = new Thread(() => {
      while (true) {
        val st = main.getStackTrace
        // topmost graft frame
        st.find(e => e.getClassName.startsWith("graft.")).foreach { e =>
          val key = s"${e.getClassName.replace("graft.html.","")}.${e.getMethodName}:${e.getLineNumber}"
          hist.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    var n = 0L
    while ((System.nanoTime() - t0) / 1e9 < 12) { pages.foreach(p => graft.html.HtmlParser.parse(p)); n += pages.size }
    println(f"rate: ${n / ((System.nanoTime() - t0) / 1e9)}%.0f docs/s")
    import scala.jdk.CollectionConverters._
    val total = hist.values().asScala.map(_.get).sum.toDouble
    hist.asScala.toSeq.sortBy(-_._2.get).take(25).foreach { case (k, v) =>
      println(f"${v.get / total * 100}%5.1f%% $k")
    }
  }
}
