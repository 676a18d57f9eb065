package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Beam ReadFromText parity (SURVEY §2.1 #9): Spark's text source gives
  * the identical split + first-line-discard semantics through Hadoop's
  * TextInputFormat, so newline-delimited sources (CDXJ indexes, URL
  * lists) need no custom code. This spec pins the round trip the engine
  * relies on: CDXJ JSON written by the sink re-reads line-exact.
  */
class TextSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("text-source-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("newline-delimited text round-trips through read.text with splits") {
    val dir = java.nio.file.Files.createTempDirectory("textsrc")
    val lines = (0 until 5000).map(i => s"""{"offset": $i, "length": ${i * 7}}""")
    java.nio.file.Files.write(dir.resolve("index.jsonl"),
      lines.mkString("\n").getBytes)
    // small split size forces multiple partitions over one file
    val df = spark.read
      .option("lineSep", "\n")
      .text(dir.toString)
    assert(df.count() == 5000L)
    val back = df.collect().map(_.getString(0)).sorted
    assert(back.toSeq == lines.sorted)
    // and json parses positionally like the CDXJ sink output
    val parsed = spark.read.json(dir.toString)
    assert(parsed.count() == 5000L)
    assert(parsed.schema.fieldNames.sorted.toSeq == Seq("length", "offset"))
  }
}
