package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: d18 stage breakdown. */
object D18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[d18] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm
    graft.SparkEntry.queries("d11_neardup_clusters")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    t("d11 clusters (warm)") {
      graft.SparkEntry.queries("d11_neardup_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    t("d18 keeper (warm)") {
      graft.SparkEntry.queries("d18_keeper_policy")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    t("d18 keeper (again)") {
      graft.SparkEntry.queries("d18_keeper_policy")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
