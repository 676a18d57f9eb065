package graft.html

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: raw extraction-kernel thread-scaling probe (no Spark in the
  * timed region) — distinguishes kernel-level contention from
  * scheduler/plan effects.  sbt "Test/runMain graft.html.KernelScale"
  */
object KernelScale {
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
    def kernelPass(reps: Int): Long = {
      var acc = 0L
      var k = 0
      while (k < reps) {
        rows.foreach { case (b, cs) =>
          acc += Html2Text.extractFromHtml(HtmlTree.decodeForParse(b, cs), opts).length
        }
        k += 1
      }
      acc
    }
    kernelPass(30) // warm
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    for (nThreads <- Seq(1, 4, 8, 16, 8, 4, 1)) {
      val reps = 60
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val ts = (1 to nThreads).map { _ =>
        val t = new Thread(() => { kernelPass(reps): Unit })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val docs = nThreads.toLong * reps * rows.length
      println(f"threads=$nThreads%2d  ${docs / sec}%9.0f docs/s total  (${docs / sec / nThreads}%7.0f per thread)  gc=${gcMs - gc0}%5d ms of ${(sec * 1000).toLong}%6d ms")
    }
  }
}
