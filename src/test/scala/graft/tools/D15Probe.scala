package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: per-stage timing of the d15 PageRank rounds. */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[d15] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm
    graft.SparkEntry.queries("d15_dup_pagerank")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // timed breakdown: pairs materialization vs pagerank rounds
    val dupsDf = t("upstream neardup dups") {
      val d = graft.queries.Documents.dupPairsProbe(spark, sfDir)
      val c = d.persist(); c.count(); c
    }
    val pr = t("PageRank.undirected (10 it)") {
      graft.operators.PageRank.undirected(dupsDf).count()
    }
    println(s"[d15] ranks=$pr")
    // anatomy of a round: join+agg+localCheckpoint over a tiny frame
    val base = t("base: 65-row checkpoint") {
      spark.range(65).selectExpr("id", "1.0d as rank").localCheckpoint()
    }
    t("round: join+agg+ckpt x5") {
      var r = base
      (1 to 5).foreach { _ =>
        r = r.join(base.selectExpr("id", "rank as r2"), Seq("id"))
          .groupBy("id").agg(sum(col("rank") * col("r2")).as("rank"))
          .localCheckpoint()
      }
    }
    t("bare job x5") {
      (1 to 5).foreach(_ => spark.range(65).count())
    }
    t("bare ckpt x5") {
      (1 to 5).foreach(_ => spark.range(65).localCheckpoint())
    }
    spark.stop()
  }
}
