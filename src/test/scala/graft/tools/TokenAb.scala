package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Dev A/B: the r16 expression forms of t22/t23 vs the current registry
  * (r18 tokenCounts kernel + shared repartition), interleaved in ONE
  * JVM so host-window swings hit both arms. min-of-N printed per arm.
  *   sbt "Test/runMain graft.tools.TokenAb 3 /root/testdata/sf0.1"
  */
object TokenAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = graft.Tables.documents(spark, sfDir)

    def oldT22(s: SparkSession, dir: String): DataFrame = {
      val toks = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("n_occ"))
      val dl = tf.groupBy(col("doc_id"))
        .agg(sum(col("n_occ")).cast("double").as("len"))
      val dfreq = toks.groupBy(col("tok"))
        .agg(count_distinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val scored = tf.join(dl, "doc_id").join(dfreq, "tok")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok").as("term"), col("n_occ"), col("df"),
          ((col("n_occ") / col("len")) * log(col("n_docs") / col("df")))
            .as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("n_occ"),
          col("df"), round(col("score"), 4).as("tfidf"))
        .orderBy(col("doc_id"), col("rnk"))
    }

    def oldT23(s: SparkSession, dir: String): DataFrame = {
      val toksAll = docs
        .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("tok"))
      val tf = toksAll.groupBy(col("doc_id"), col("source"), col("tok"))
        .agg(count(lit(1)).as("n_occ"))
      val corpus = toksAll.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val tot = corpus.agg(sum(col("f")).cast("double").as("big_f"),
        count(lit(1)).cast("double").as("v"))
      val target = toksAll.filter(col("source") === "src0")
        .groupBy(col("tok")).agg(count(lit(1)).as("ct0"))
      val ttot = target.agg(sum(col("ct0")).cast("double").as("ft"))
      val scored = tf.join(corpus, "tok")
        .join(target, Seq("tok"), "left")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(ttot))
        .select(col("doc_id"), col("source"), col("n_occ"),
          (col("n_occ") *
            (log((coalesce(col("ct0"), lit(0L)) + 1.0) / (col("ft") + col("v"))) -
             log(col("f") / col("big_f")))).as("term"))
      scored.groupBy(col("doc_id"), col("source"))
        .agg(sum(col("n_occ")).as("n_tokens"),
          round(sum(col("term")) / sum(col("n_occ")), 4).as("dsir_score"))
        .withColumn("keep", col("dsir_score") > 0)
        .orderBy(col("doc_id"))
    }

    def oldT08(s: SparkSession, dir: String): DataFrame =
      docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
             count(lit(1)).as("n_distinct"),
             max(col("c")).as("top_count"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("distinct_ratio"),
          round(col("top_count").cast("double") / col("n_tokens"), 6).as("top_token_frac"))
        .orderBy(col("doc_id"))

    def oldT14(s: SparkSession, dir: String): DataFrame =
      docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occ").desc, col("tok"))
        .limit(25)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "t08_old" -> (() => oldT08(spark, sfDir)),
      "t08_new" -> (() => graft.SparkEntry.queries("t08_repetition")(spark, sfDir)),
      "t14_old" -> (() => oldT14(spark, sfDir)),
      "t14_new" -> (() => graft.SparkEntry.queries("t14_vocab")(spark, sfDir)),
      "t22_old" -> (() => oldT22(spark, sfDir)),
      "t22_new" -> (() => graft.SparkEntry.queries("t22_tfidf_keywords")(spark, sfDir)),
      "t23_old" -> (() => oldT23(spark, sfDir)),
      "t23_new" -> (() => graft.SparkEntry.queries("t23_dsir_importance")(spark, sfDir)))
    try { docs.selectExpr("sum(length(text))").collect(); () } catch { case _: Throwable => }
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to reps).foreach { r =>
      arms.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
        println(f"TIMING $name rep$r $sec%8.3f s")
      }
    }
    best.toSeq.sorted.foreach { case (n, s) => println(f"BEST $n $s%8.3f s") }
    spark.stop()
  }
}
