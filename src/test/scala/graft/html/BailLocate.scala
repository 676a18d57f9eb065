package graft.html

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: binary-search the input position whose prefix first trips the
  * streaming extractor's Bail, and print the surrounding markup.
  *   sbt "Test/runMain graft.html.BailLocate"
  */
object BailLocate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.read.format("warc")
      .load("/root/reference/tests/data/warcfile.warc.gz")
      .filter(col("record_type") === "response")
      .select(col("http_body"), col("http_charset"))
      .collect()
      .map(r => (r.getAs[Array[Byte]]("http_body"), r.getAs[String]("http_charset")))
    spark.stop()
    val opts = Html2Text.Options()
    def bails(html: String): Boolean =
      try { Html2TextStream.extractStreaming(html, opts); false }
      catch { case _: scala.util.control.ControlThrowable => true }
    for (i <- Seq(12, 15)) {
      val html = HtmlTree.decodeForParse(rows(i)._1, rows(i)._2)
      if (!bails(html)) println(s"page $i: no bail?!")
      else {
        var lo = 0; var hi = html.length
        while (lo < hi) { // smallest prefix that bails
          val mid = (lo + hi) / 2
          if (bails(html.substring(0, mid))) hi = mid else lo = mid + 1
        }
        val s = math.max(0, lo - 300)
        println(s"page $i bails at prefix $lo/${html.length}:")
        println("..." + html.substring(s, lo).replace("\n", "\\n") + "<<<HERE>>>" +
          html.substring(lo, math.min(html.length, lo + 60)).replace("\n", "\\n"))
      }
    }
  }
}
