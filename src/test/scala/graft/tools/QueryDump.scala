package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print a single SparkEntry query's rows (full untruncated) —
  * used to derive / audit pinned VALUES oracles.
  *   sbt "Test/runMain graft.tools.QueryDump w28_html_rewrite [sfDir]"
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.printSchema()
    df.collect().foreach { r => println(r.toSeq.mkString(" | ")) }
    spark.stop()
  }
}
