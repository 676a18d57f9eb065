package graft.queries

import org.apache.spark.sql.functions._

/** Dev probe: does a session that runs MANY sequential streaming
  * queries degrade? (The floor probe saw 12 s → 25 s → 26 s across
  * three 32-partition drives.) Prints per-drive wall, JVM heap, and
  * thread count so the growth — if real — gets attributed.
  * Run: sbt "Test/runMain graft.queries.StreamingLeakProbe [drives] [parts]"
  */
object StreamingLeakProbe {
  def main(args: Array[String]): Unit = {
    val drives = if (args.nonEmpty) args(0).toInt else 8
    val parts = if (args.length > 1) args(1).toInt else 32
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "nochecksum")
      s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val codes = s.range(3000).select(col("id").as("doc_id"),
      (col("id") * 2654435761L).as("h0"), (col("id") * 40503L).as("h1"))
      .localCheckpoint()
    codes.count()
    (1 to drives).foreach { i =>
      val t0 = System.nanoTime()
      val n = StreamingDedup.streamSuppressed(s, codes, s"leak$i").count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.gc()
      val heapMb = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / (1024 * 1024)
      val threads = Thread.activeCount()
      println(f"[leak] drive $i%2d  $sec%6.2f s  supp=$n  " +
        f"heap=${heapMb}%5d MB  threads=$threads%4d  parts=$parts")
    }
    // attribute the survivors: name-prefix histogram of live threads
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.keySet.asScala.toSeq
      .map(_.getName.replaceAll("[0-9]+", "#"))
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2).take(15)
      .foreach { case (name, n) => println(f"[leak] $n%5d  $name") }
    s.stop()
  }
}
