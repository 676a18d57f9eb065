package graft.html

import org.apache.spark.sql.functions._

/** One-off audit probe for the two w13 pins that shifted when the
  * round-10 end-tag rules landed (main_len 1933->319 at full 2331,
  * 2273->657 at full 2762): dumps each page's URL, full text and
  * main-content text so the classification can be hand-checked against
  * the reference's html2text.pyx block rules.
  */
object W13PinProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val rows = s.read.format("warc")
      .load("/root/reference/tests/data/warcfile.warc.gz")
      .filter(col("record_type") === "response")
      .select(graft.functions.WarcCols.targetUri(col("headers")).as("target_uri"),
        col("http_body"), col("http_charset"))
      .collect()
      .map(r => (r.getAs[String]("target_uri"),
        r.getAs[Array[Byte]]("http_body"), r.getAs[String]("http_charset")))
    s.stop()
    for ((uri, body, cs) <- rows) {
      val html = HtmlTree.decodeForParse(body, cs)
      val tree = HtmlTree.parse(html)
      val full = Html2Text.extract(tree, Html2Text.Options())
      if (full.length == 2331 || full.length == 2762) {
        val main = Html2Text.extract(tree, Html2Text.Options(mainContent = true))
        println(s"==== $uri full=${full.length} main=${main.length}")
        println("---- MAIN ----")
        println(main)
        println("---- FULL ----")
        println(full)
        val out = s"/tmp/w13_${full.length}"
        java.nio.file.Files.write(java.nio.file.Paths.get(out + ".html"),
          html.getBytes("UTF-8"))
        java.nio.file.Files.write(java.nio.file.Paths.get(out + "_main.txt"),
          main.getBytes("UTF-8"))
        java.nio.file.Files.write(java.nio.file.Paths.get(out + "_full.txt"),
          full.getBytes("UTF-8"))
      }
    }
  }
}
