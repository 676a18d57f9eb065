package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: time one registry query N times in a single JVM —
  * distinguishes steady-state cost from first-run JIT/codegen cost.
  *   sbt "Test/runMain graft.tools.QueryTime <query> [n] [sfDir]"
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[qtime] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
