package graft.queries

import org.apache.spark.sql.functions._

/** Dev probe (test scope): phase-level attribution of the streaming
  * gauges' fixed cost — what share of a query like d28 is the actual
  * micro-batch machinery vs landing writes vs the batch-side compare.
  * Run: sbt "Test/runMain graft.queries.StreamingFloorProbe"
  */
object StreamingFloorProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm shared machinery
    s.range(1000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    // d28's code kernel, reproduced (simhash64 over documents + clones)
    val codes = t("codes kernel (batch, localCheckpoint)") {
      val base = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val df = base.select(col("doc_id"),
        graft.functions.TextAnalysis.simhash64(col("text")).as("sh"))
        .select(col("doc_id"),
          conv(substring(col("sh"), 1, 8), 16, 10).cast("long").as("h0"),
          conv(substring(col("sh"), 9, 8), 16, 10).cast("long").as("h1"))
        .localCheckpoint()
      df.count(); df
    }
    (1 to 3).foreach { i =>
      t(s"streamSuppressed (3-wave drive) run $i") {
        graft.operators.RoundPartitions.scoped(s, 2048) {
          StreamingDedup.streamSuppressed(s, codes, s"probe$i").count()
        }
      }
    }
    // decompose one streaming drive: landing writes vs stream machinery
    val landing = Scratch.fastFresh("probe_landing")
    landing.mkdirs()
    t("landing writes x3 (batch jobs)") {
      (0 to 2).foreach { w =>
        codes.filter(col("doc_id") % 3 === w)
          .coalesce(1).write.mode("append").parquet(landing.getPath)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType)))
    graft.operators.RoundPartitions.scoped(s, 2048) {
      val verdicts = graft.streaming.StreamingNeardup.bandVerdicts(
        s.readStream.schema(schema).parquet(landing.getPath))
      val q = t("stream start()") {
        verdicts.writeStream.format("memory").queryName("probe_mem")
          .outputMode("append")
          .option("checkpointLocation", Scratch.fastFresh("probe_ckpt").getPath)
          .start()
      }
      t("processAllAvailable (3 waves pre-landed)") { q.processAllAvailable() }
      Option(q.lastProgress).foreach(p =>
        println(s"[probe] last batch durationMs = ${p.durationMs}"))
      q.recentProgress.foreach(p =>
        println(s"[probe] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}"))
      t("stop()") { q.stop() }
      t("read memory table + agg") {
        s.table("probe_mem").groupBy(col("doc_id"))
          .agg(max(col("matched"))).count()
      }
    }
    s.stop()
  }
}
