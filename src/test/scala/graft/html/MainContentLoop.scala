package graft.html
import org.apache.spark.sql.functions._
object MainContentLoop {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val rows = s.read.format("warc")
      .load("/root/reference/tests/data/warcfile.warc.gz")
      .filter(col("record_type") === "response")
      .select(col("http_body"), col("http_charset"))
      .collect()
      .map(r => (r.getAs[Array[Byte]]("http_body"), r.getAs[String]("http_charset")))
    s.stop()
    val decoded = rows.map { case (b, cs) => HtmlTree.decodeForParse(b, cs) }
    val opts = Html2Text.Options(mainContent = true)
    var acc = 0L
    while (true) {
      decoded.foreach(h => acc += Html2Text.extract(HtmlTree.parse(h), opts).length)
      if (acc == -1) println(acc)
    }
  }
}
