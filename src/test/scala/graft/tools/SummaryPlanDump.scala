package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev (r18): dump the UNMATERIALIZED d20 summary plan — the registry
  * query eagerly localCheckpoints its 1-row summary, so the committed
  * `plans/` dump shows only an ExistingRDD scan; the union-pivot
  * rewrite's evidence is the audit-path plan (materialize = false),
  * where the former eight crossJoined aggregate subtrees vs the one
  * tagged-union aggregate are visible.
  *   sbt "Test/runMain graft.tools.SummaryPlanDump plans/r18 before|after"
  */
object SummaryPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val d = graft.Tables.documents(spark, dir)
    val existing = d.filter(col("doc_id") % 2 === 0)
    val incoming = d.filter(col("doc_id") % 2 === 1)
    val summary = graft.queries.Documents.incrementalNeardup(
      existing, incoming, materialize = false)
    val plan = summary.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"d20_summary_subplan_$suffix.txt"),
      plan.getBytes("UTF-8"))
    println(s"wrote $outDir/d20_summary_subplan_$suffix.txt")
    spark.stop()
  }
}
