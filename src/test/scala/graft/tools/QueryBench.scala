package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected SparkEntry queries in isolation, N reps each.
  *   sbt "Test/runMain graft.tools.QueryBench w26_host_stats,d08_neardup_skewed 3 /root/testdata/sf0.1"
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet")
        .write.format("noop").mode("overwrite").save()
      spark.read.format("warc")
        .load("/root/reference/tests/data/warcfile.warc.gz").count()
    } catch { case _: Throwable => }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val j0 = jobs.get
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIMING $name rep$r $sec%8.3f s jobs=${jobs.get - j0}")
      }
    }
    spark.stop()
  }
}
