package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Dev-only: bisect the d08 neardup pipeline stage costs at sf0.1.
  *   sbt "Test/runMain graft.queries.NeardupBisect [sfDir]"
  */
object NeardupBisect {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val viral = spark.range(10000)
      .select((col("id") + 1000000L).as("doc_id"),
        concat(lit(Documents.ViralTemplate), col("id").cast("string")).as("text"))
    val d = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(viral)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })
    def time(name: String)(df: => DataFrame): Unit = {
      // warm + measure
      (1 to 2).foreach { r =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
        val cpu0 = cpuNs.get
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val cpu = (cpuNs.get - cpu0) / 1e9
        if (r == 2) println(f"[bisect] $name%-32s $sec%7.2fs  cpu=$cpu%7.2fs")
      }
    }
    val bandsDf = d.withColumn("sig", minhashShingleSigCW(col("text"), 3, 8))
      .select(col("doc_id"), posexplode(lshBands(col("sig"), 4, 2)).as(Seq("band_id", "band_key")))
    if (!sys.env.contains("BISECT_SAMPLE")) {
    time("corpus_scan")(d)
    time("tokens_only")(d.select(col("doc_id"), tokens(col("text")).as("tk")))
    time("grams(array_distinct tokens)")(
      d.select(col("doc_id"), array_distinct(tokens(col("text"))).as("g")))
    time("minhash_sig")(
      d.select(col("doc_id"), minhashShingleSigCW(col("text"), 3, 8).as("sig")))
    time("bands(sig+posexplode)")(bandsDf)
    time("bucketSizes")(bandsDf.groupBy(col("band_id"), col("band_key")).agg(count(lit(1)).as("n")))
    // full cand join without persists
    val sizes = bandsDf.groupBy(col("band_id"), col("band_key")).agg(count(lit(1)).as("bucket_n"))
    val safe = sizes.filter(col("bucket_n") <= 64).select("band_id", "band_key")
    val safeBands = bandsDf.join(safe, Seq("band_id", "band_key"))
    val cand = safeBands.alias("a").join(safeBands.alias("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand(unpersisted chain)")(cand)
    val grams = d.select(col("doc_id"), array_distinct(tokens(col("text"))).as("g"))
    val scored = cand
      .join(grams.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(grams.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
         size(array_union(col("ga"), col("gb")))).as("jac"))
    time("scored(jaccard verify)")(scored)
    time("full_d08_summary")(Documents.queries("d08_neardup_skewed")(spark, dir))
    }
    // stack-sample the executor pool while bucketSizes loops
    if (sys.env.contains("BISECT_SAMPLE")) {
      val hot = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          Thread.getAllStackTraces.forEach { (t, st) =>
            if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
              val frame = st.take(12).find(f =>
                !f.getClassName.startsWith("java.lang.Thread")).map(_.toString).getOrElse("?")
              hot.computeIfAbsent(frame, _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
            }
          }
          Thread.sleep(3)
        }
      })
      sampler.setDaemon(true); sampler.start()
      val bs = bandsDf.groupBy(col("band_id"), col("band_key")).agg(count(lit(1)).as("n"))
      (1 to 15).foreach(_ => bs.write.format("noop").mode("overwrite").save())
      sampling = false
      import scala.jdk.CollectionConverters._
      hot.asScala.toSeq.sortBy(-_._2.get).take(25).foreach { case (f, n) =>
        println(f"[hot] ${n.get}%5d  $f")
      }
    }
    spark.stop()
  }
}
