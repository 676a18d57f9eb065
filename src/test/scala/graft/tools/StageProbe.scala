package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev-only (test scope): run ONE registry query under the bench's
  * session shape and print a per-stage ledger — stage name, task count,
  * executor run ms, submit→complete wall — plus the job count. The
  * round-17 optimization rounds live on this decomposition: the sweep
  * wall at sf0.1 is fixed-cost dominated (jobs × stages × tasks), so
  * cuts must name the stage they remove.
  *
  *   sbt "Test/runMain graft.tools.StageProbe d08_neardup_skewed [sfDir] [reps]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, tasks: Int, runMs: Long, wallMs: Long, cpuMs: Long)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val runMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val cpuMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          runMs.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(t.taskMetrics.executorRunTime)
          cpuMs.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        // first graft frame in the stage's call-site details names the
        // operator the stage belongs to far better than si.name does
        val graftFrame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("StageProbe"))
          .map(_.trim.take(80)).getOrElse("") +
          " rdds=" + si.rddInfos.map(r => r.scope.map(_.name).getOrElse(r.name))
            .distinct.mkString(",").take(120)
        stages.put(si.stageId, St(si.name.take(40) + " | " + graftFrame, si.numTasks,
          Option(runMs.get(si.stageId)).map(_.get).getOrElse(0L), wall,
          Option(cpuMs.get(si.stageId)).map(_.get).getOrElse(0L)))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warmup rep(s) then the measured rep, mirroring the bench sweep
    (1 to reps).foreach { r =>
      stages.clear(); runMs.clear(); jobs.set(0)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== rep $r: $name wall=$sec%.2fs jobs=${jobs.get} stages=${stages.size}")
      if (r == reps) {
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(_._1)
        rows.foreach { case (id, st) =>
          println(f"  stage $id%4d tasks=${st.tasks}%3d run=${st.runMs}%6dms cpu=${st.cpuMs}%6dms wall=${st.wallMs}%6dms  ${st.name}")
        }
        val totTasks = rows.map(_._2.tasks).sum
        val totRun = rows.map(_._2.runMs).sum
        val totWall = rows.map(_._2.wallMs).sum
        println(f"  TOTAL tasks=$totTasks run=${totRun}ms stageWall=${totWall}ms")
      }
    }
    spark.stop()
  }
}
