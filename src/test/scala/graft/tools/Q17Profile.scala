package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: stage-level timing for q17 (sample-quantile sketch). */
object Q17Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice").as("v"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("h"))
    time("warm scan")(li.write.format("noop").mode("overwrite").save())
    time("scan only")(li.write.format("noop").mode("overwrite").save())
    time("topk 1024 by hash")(
      li.orderBy(col("h"), col("v")).limit(1024).write.format("noop").mode("overwrite").save())
    time("percentile x3")(
      li.agg(expr("percentile(v, 0.5D)"), expr("percentile(v, 0.9D)"),
        expr("percentile(v, 0.99D)")).write.format("noop").mode("overwrite").save())
    time("percentile array")(
      li.agg(expr("percentile(v, array(0.5D, 0.9D, 0.99D))"))
        .write.format("noop").mode("overwrite").save())
    time("full q17")(
      graft.SparkEntry.queries("q17_sample_quantiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    time("full q17 again")(
      graft.SparkEntry.queries("q17_sample_quantiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
