import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._
object DebugDedup extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  println("=schema=")
  docs.printSchema()
  spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").printSchema()
  // simhash64 sanity
  val sh = docs.withColumn("cnt", simhash64Counts("text"))
    .select(col("doc_id"), simhash64Hex("cnt").as("simhash64"))
  sh.show(5, false)
  // near-dup candidates
  val sig = docs.select(col("doc_id"), col("text"),
    minhashSignature(wordShingles(col("text"), 3), 8).as("sig"))
  val bands = sig.select(col("doc_id"), posexplode(lshBands(col("sig"), 4, 2)).as(Seq("band_id", "band_key")))
  val a = bands.alias("a"); val b = bands.alias("b")
  val cand = a.join(b, col("a.band_id") === col("b.band_id") &&
      col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
    .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
  println("n_candidates = " + cand.count())
  val grams = docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("g"))
  val ga = grams.select(col("doc_id").as("doc_a"), col("g").as("ga"))
  val gb = grams.select(col("doc_id").as("doc_b"), col("g").as("gb"))
  val verified = cand.join(ga, "doc_a").join(gb, "doc_b")
    .select(col("doc_a"), col("doc_b"),
      round(size(array_intersect(col("ga"), col("gb"))).cast("double") /
            size(array_union(col("ga"), col("gb"))), 6).as("jac"))
  verified.orderBy(col("jac").desc).show(20)
  verified.agg(count(lit(1)), sum(when(col("jac") >= 0.5, 1)), sum(when(col("jac") >= 0.3, 1)), sum(when(col("jac") >= 0.2, 1))).show()
  spark.stop()
}
