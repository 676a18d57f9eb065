package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the streaming-gauge fixed cost (round-14 verdict item 1:
  * the 9 streaming queries sum to ~20-23 s at sf0.1; target ≤18 s).
  * Drives the d28 shape (3 landed waves → StreamingNeardup → memory
  * sink) with nanoTime marks at every phase and prints the ledger,
  * twice (cold + warm), so the cut targets the measured term, not a
  * guess. Run: `sbt "runMain graft.tools.StreamingFloorProbe"`.
  */
object StreamingFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Scratch
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    def drive(label: String, asyncProgress: Boolean = false,
        statelessNoop: Boolean = false): Unit =
      graft.streaming.TransientCheckpoints.scoped(spark) {
        graft.operators.RoundPartitions.scoped(spark, 2048) {
          val marks = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Int)]
          var t0 = System.nanoTime()
          var j0 = jobs.get
          def mark(name: String): Unit = {
            marks += ((name, (System.nanoTime() - t0) / 1e9, jobs.get - j0))
            t0 = System.nanoTime()
            j0 = jobs.get
          }
          val codes = spark.range(2048).select(col("id").as("doc_id"),
            (col("id") * 2654435761L).as("h0"),
            (col("id") * 40503L).as("h1")).localCheckpoint()
          mark("codes checkpoint")
          val landing = Scratch.fastFresh("floorprobe_landing")
          landing.mkdirs()
          val ckpt = Scratch.fastFresh("floorprobe_ckpt")
          mark("scratch dirs")
          def land(wave: Int): Unit =
            codes.filter(col("doc_id") % 3 === wave)
              .coalesce(1).write.mode("append").parquet(landing.getPath)
          land(0)
          mark("land wave 0")
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("h0",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("h1",
              org.apache.spark.sql.types.LongType)))
          // statelessNoop (r18): the ENGINE-ONLY reference drive — same
          // file source, landing waves, memory sink and trigger loop,
          // but a trivial stateless projection instead of the stateful
          // dedup. gauge_drive − noop_drive = the state-store + kernel
          // share; everything in the noop drive is micro-batch machinery
          // (trigger, WAL/offset logs, file listing, job scheduling) no
          // query shape can remove while remaining a streaming gauge.
          val stream = spark.readStream.schema(schema).parquet(landing.getPath)
          val verdicts =
            if (statelessNoop)
              stream.select(col("doc_id"), (col("h0") + col("h1")).as("s"))
            else graft.streaming.StreamingNeardup.bandVerdicts(stream).toDF()
          mark("plan build")
          val qname = s"floorprobe_${label}_${System.nanoTime()}"
          var w = verdicts.writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt.getPath)
          if (asyncProgress)
            w = w.option("asyncProgressTrackingEnabled", "true")
              .option("asyncProgressTrackingCheckpointIntervalMs", "60000")
          val q = w.start()
          mark("stream start")
          q.processAllAvailable()
          mark("batch 1 (wave 0)")
          land(1)
          mark("land wave 1")
          q.processAllAvailable()
          mark("batch 2 (wave 1)")
          land(2)
          mark("land wave 2")
          q.processAllAvailable()
          mark("batch 3 (wave 2)")
          Option(q.lastProgress).foreach(p =>
            println(s"[floor]   durationMs ${p.durationMs}"))
          q.stop()
          mark("stream stop")
          val n = if (statelessNoop) spark.table(qname).count()
            else spark.table(qname).groupBy(col("doc_id"))
              .agg(max(col("matched")).as("m")).filter(col("m")).count()
          mark(s"summary count ($n suppressed)")
          val total = marks.map(_._2).sum
          println(f"[floor] == $label: total $total%6.2f s  jobs=${marks.map(_._3).sum} ==")
          marks.foreach { case (k, v, j) =>
            println(f"[floor]   $k%-28s $v%6.3f s  jobs=$j") }
        }
      }

    drive("cold")
    drive("warm1")
    drive("warm2")
    drive("noop1", statelessNoop = true)
    drive("noop2", statelessNoop = true)
    drive("noop3", statelessNoop = true)
    drive("warm3")
    // hypothesis: per-micro-batch wall is dominated by IncrementalExecution
    // re-planning + whole-stage-codegen COMPILATION per batch — for
    // hundreds-of-rows batches the interpreted path should win
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    drive("nocodegen1")
    drive("nocodegen2")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    drive("nofactory1")
    drive("nofactory2")
    try drive("async1", asyncProgress = true)
    catch { case e: Throwable => println(s"[floor] async failed: $e") }
    try drive("async2", asyncProgress = true)
    catch { case e: Throwable => println(s"[floor] async failed: $e") }
    spark.stop()
  }
}
