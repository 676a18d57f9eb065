package graft.tools

/** Dev profiling main (test scope): the MAIN-CONTENT extraction path in
  * a tight loop, for JFR attribution of the classifier's cost over the
  * plain path. Run:
  *   sbt "Test/runMain graft.tools.MainContentProfile [reps] [plain]"
  * or directly under JFR with `java -cp <classes+test-classes+spark jars>
  * -XX:StartFlightRecording=...,settings=profile graft.tools.MainContentProfile 800`.
  */
object MainContentProfile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 400
    val plain = args.length > 1 && args(1) == "plain"
    val ab = args.length > 1 && args(1) == "ab"
    val fx = "/root/reference/tests/data/warcfile.warc"
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(fx))
    val it = new graft.core.WarcParser(new graft.core.WarcByteReader(in), fx)
    val pages = it.toVector.filter(_.recordType == "response")
      .flatMap(r => r.http.map(h => (h.body, h.charset.getOrElse(""))))
    in.close()
    val trees = pages.map { case (b, cs) => graft.html.HtmlTree.parseFromBytes(b, cs) }
    val opts = graft.html.Html2Text.Options(mainContent = !plain)
    var sink = 0L
    // warmup
    (1 to 50).foreach(_ => trees.foreach(t =>
      sink += graft.html.Html2Text.extract(t, opts).length))
    if (ab) {
      // interleaved min-of-N A/B of the classifier-regex trigger
      // prefilter: both arms alternate inside ONE process so they share
      // whatever contention window the host is in (README measurement
      // doctrine — never compare across windows)
      def arm(on: Boolean): Double = {
        graft.html.Html2Text.UsePrefilter = on
        val t0 = System.nanoTime()
        var k = 0
        while (k < reps) {
          trees.foreach(t => sink += graft.html.Html2Text.extract(t, opts).length)
          k += 1
        }
        trees.size * reps / ((System.nanoTime() - t0) / 1e9)
      }
      arm(true); arm(false) // per-arm JIT warm
      val rates = (1 to 5).map(_ => (arm(true), arm(false)))
      graft.html.Html2Text.UsePrefilter = true
      val on = rates.map(_._1).max
      val off = rates.map(_._2).max
      println(f"prefilter A/B (5 interleaved rounds, max): on=$on%.0f docs/s " +
        f"off=$off%.0f docs/s  speedup=${on / off}%.3fx (sink=$sink)")
      rates.foreach { case (a, b) => println(f"  round: on=$a%.0f off=$b%.0f") }
      return
    }
    val t0 = System.nanoTime()
    var k = 0
    while (k < reps) {
      trees.foreach(t => sink += graft.html.Html2Text.extract(t, opts).length)
      k += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"${if (plain) "plain" else "main-content"}: ${trees.size * reps} docs " +
      f"in $sec%.2fs = ${trees.size * reps / sec}%.0f docs/s/core (sink=$sink)")
  }
}
