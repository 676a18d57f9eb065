package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the tiny-scope AQE disable in
  * [[graft.operators.RoundPartitions]]: runs the named queries
  * alternately with the disable ON and OFF in one process (min-of-N per
  * arm), so host-window drift — measured up to 4× between consecutive
  * runs on this container — cancels out. Usage:
  * `sbt "runMain graft.tools.AqeAb d15_dup_pagerank,d12_clusters_stars [rounds]"`.
  */
object AqeAb {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse("d15_dup_pagerank,d12_clusters_stars").split(',').toSeq
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(runOnce) // warm both paths
    names.foreach { name =>
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to rounds).foreach { _ =>
        graft.operators.RoundPartitions.disableAqeInTinyScopes = true
        on += runOnce(name)
        graft.operators.RoundPartitions.disableAqeInTinyScopes = false
        off += runOnce(name)
      }
      // restore the documented default (AQE on — the A/B REJECTED the
      // off switch) before reporting; leaving the dev switch set would
      // poison any post-A/B step this tool ever grows
      graft.operators.RoundPartitions.disableAqeInTinyScopes = false
      println(f"[ab] $name%-28s aqeOFF min=${on.min}%6.2f s (${on.map(t => f"$t%.2f").mkString("/")})" +
        f"  aqeON min=${off.min}%6.2f s (${off.map(t => f"$t%.2f").mkString("/")})" +
        f"  ratio=${off.min / on.min}%5.2f")
    }
    spark.stop()
  }
}
