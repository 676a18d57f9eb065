package graft.html

/** Dev: time the streaming extractor on the table bomb at increasing
  * sizes — a hang/superlinearity reproducer.
  *   sbt "Test/runMain graft.html.BombProbe"
  */
object BombProbe {
  def main(args: Array[String]): Unit = {
    for (reps <- Seq(1000, 10000, 50000, 200000)) {
      val bomb = "<table>" + "<tr><td>x</td><td>y</td></tr>" * reps
      val t0 = System.nanoTime()
      val out = try {
        Html2Text.extractFromHtml(bomb, Html2Text.Options(maxNodes = 2000000))
          .length.toString
      } catch { case e: Throwable => e.getClass.getSimpleName }
      println(f"reps=$reps%7d  ${(System.nanoTime() - t0) / 1e6}%9.1f ms  out=$out")
    }
  }
}
