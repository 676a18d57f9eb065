package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity harness for the flagship w29 pipeline: runs the same
  * scan → extract → lang/quality → fp-combine → split shape over 1×, 4×
  * and 16× the bench corpus (16/64/256 archive files × 100 member-copies
  * of the 16 real fixture pages) and reports wall-clock per scale plus
  * the deviation from linear. Direct evidence for the "survives a 100×
  * scale-up" claim: the plan is scan-bound with a fingerprint-only
  * shuffle, so time should track corpus size ~1:1 once past fixed costs.
  * Dev tooling — `sbt "runMain graft.tools.ScaleCheck [scales]"`;
  * results are recorded in SCALING.md.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pipeline(dir: String): DataFrame = {
      import graft.functions.Web
      val perPage = spark.read.format("warc")
        .option("record_types", "response")
        .load(dir)
        .select(Web.extractPlainText(col("http_body"), col("http_charset")).as("text"))
        .filter(col("text").isNotNull)
        .select(md5(col("text")).as("fp"),
          Web.detectLang(col("text")).getField("lang").as("lang"),
          (graft.functions.TextAnalysis.tokenCount(col("text")) >= 50).cast("int")
            .as("long_enough"))
      perPage.groupBy(col("fp"))
        .agg(count(lit(1)).as("copies"), max(col("lang")).as("lang"),
          max(col("long_enough")).as("qual"))
        .agg(sum(col("copies")).as("n_pages"),
          sum(col("qual")).as("n_unique_docs"))
    }

    // corpus dirs (reused across runs, like the bench)
    val dirs = scales.map { s =>
      s -> graft.sources.BenchCorpus.ensure(
        s"${System.getProperty("java.io.tmpdir")}/graft_warc_scale_$s",
        files = 16 * s, copiesPerFile = 100)
    }
    // warmup at 1x so codegen/reader init doesn't bill the first scale
    pipeline(dirs.head._2).collect()

    val results = dirs.map { case (s, dir) =>
      System.gc()
      val t0 = System.nanoTime()
      val row = pipeline(dir).collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] ${s}x  files=${16 * s}%4d  pages=${row.getLong(0)}%8d  " +
        f"unique=${row.getLong(1)}  wall=$sec%7.2f s")
      s -> sec
    }
    val (s0, t0) = results.head
    results.foreach { case (s, t) =>
      val linear = t0 * s / s0
      println(f"[scale] ${s}x: $t%7.2f s  vs linear $linear%7.2f s  " +
        f"ratio ${t / linear}%5.2f")
    }
    spark.stop()
  }
}
