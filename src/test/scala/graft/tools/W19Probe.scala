package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe (test scope): task-level timing of the w19 extraction query.
  *   sbt "Test/runMain graft.tools.W19Probe [cpus]"
  */
object W19Probe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}] ${si.name.take(60)} tasks=${si.numTasks} " +
          f"runMs=${m.executorRunTime} cpuMs=${m.executorCpuTime / 1000000} " +
          f"gcMs=${m.jvmGCTime}")
      }
    })
    // warmup shared infra
    spark.read.format("warc").load("/root/reference/tests/data/warcfile.warc.gz").count()

    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("w19_html_extract10k")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name wall: $sec%.2fs")
    }
    spark.stop()
  }
}
