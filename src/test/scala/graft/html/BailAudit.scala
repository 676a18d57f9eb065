package graft.html

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: report which fixture pages bail from the streaming extractor to
  * the DOM fallback (they pay a streaming prefix AND a full DOM parse).
  *   sbt "Test/runMain graft.tools.BailAudit"
  */
object BailAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.read.format("warc")
      .load("/root/reference/tests/data/warcfile.warc.gz")
      .filter(col("record_type") === "response")
      .select(col("record_id"), col("http_body"), col("http_charset"))
      .collect()
      .map(r => (r.getAs[String]("record_id"),
        r.getAs[Array[Byte]]("http_body"), r.getAs[String]("http_charset")))
    spark.stop()
    val opts = Html2Text.Options()
    rows.zipWithIndex.foreach { case ((id, b, cs), i) =>
      val html = HtmlTree.decodeForParse(b, cs)
      val streamed =
        try { Html2TextStream.extractStreaming(html, opts); "STREAM" }
        catch {
          case _: scala.util.control.ControlThrowable => "BAIL"
          case e: Throwable => s"ERROR ${e.getClass.getSimpleName}"
        }
      println(f"page $i%2d ${html.length}%8d chars  $streamed%-6s  $id")
    }
  }
}
