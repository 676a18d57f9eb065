package graft.html

/** Dev: sweep adversarial page shapes at increasing sizes and flag
  * superlinear extraction cost — the pathological-crawl-page classes a
  * 100 TB corpus is guaranteed to contain.
  *   sbt "Test/runMain graft.html.ShapeProbe"
  */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val shapes: Seq[(String, Int => String)] = Seq(
      "p-b residue" -> (n => "<p><b>x" * n),
      "matched font" -> (n => "<font size=1>x</font>" * n),
      "deep divs" -> (n => "<div>" * n),
      "table rows" -> (n => "<table>" + "<tr><td>x" * n),
      "comments" -> (n => "x<!--c-->" * n),
      "links" -> (n => "<a href=q>x</a>" * n),
      "nested a" -> (n => "<a href=q>x" * n),
      "i-b misnest" -> (n => "<i><b>x</i></b>" * n),
      "li list" -> (n => "<ul>" + "<li>x" * n),
      "entity text" -> (n => "x&amp;" * n))
    val opts = Html2Text.Options()
    for ((name, mk) <- shapes) {
      val times = for (n <- Seq(2000, 20000, 100000)) yield {
        val doc = mk(n)
        val t0 = System.nanoTime()
        val r = try Html2Text.extractFromHtml(doc, opts).length.toString
          catch { case e: Throwable => e.getClass.getSimpleName }
        ((System.nanoTime() - t0) / 1e6, r)
      }
      val (t1, t2, t3) = (times(0)._1, times(1)._1, times(2)._1)
      // 10x then 5x input growth; flag when cost grows much faster
      val flag = if (t3 > t2 * 12 || t2 > t1 * 25) "  <-- SUPERLINEAR?" else ""
      println(f"$name%-14s ${t1}%8.1f ms ${t2}%9.1f ms ${t3}%9.1f ms  out=${times(2)._2}$flag")
    }
  }
}
