package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: dump `explain("formatted")` for the named registry queries into
  * per-query files — the round-17 optimization evidence
  * (`plans/r17/<query>_{before,after}.txt`).
  *
  *   sbt "Test/runMain graft.tools.PlanDump plans/r17 before q1,q2,..."
  *
  * A suffix ending in `_final` (r18) EXECUTES the query through the noop
  * sink first and dumps the POST-AQE executed plan instead — the static
  * explain shows `isFinalPlan=false` trees where exchange reuse and
  * runtime join strategy changes are invisible (a statically-duplicated
  * repartition subtree is one reused shuffle stage at runtime).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val runFinal = suffix.endsWith("_final")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = if (runFinal) {
        // collect() (not a noop write, which builds its OWN
        // QueryExecution) so THIS df's adaptive plan finalizes and the
        // dump shows runtime stage reuse / join rewrites
        df.collect()
        df.queryExecution.executedPlan.toString
      } else df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
