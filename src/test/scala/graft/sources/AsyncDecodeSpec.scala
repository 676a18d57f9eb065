package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Proof-or-demotion of the `async_decode` scan option in its TARGET
  * regime (r16 verdict item 4). The option was measured a LOSS for
  * local CPU-bound decode (PROFILE_r16: 976 → 673 MB/s single-stream)
  * and ships only for latency-bound upstreams — forward http(s)/
  * object-store streams where each read is a network round-trip. This
  * spec creates exactly that regime with the latency-shimmed FS double
  * (1 ms injected round-trip per ≤16 KiB read — a ~16 MB/s effective
  * stream, the shape of a mid-continent HTTPS crawl read) and a
  * downstream that does real per-record work (HTML parse +
  * extract_plain_text), then measures the end-to-end scan wall with
  * and without the option.
  *
  * Why the win exists: without async_decode the task thread serializes
  * round-trips with extraction (wall ≈ N + P); with it the producer
  * thread absorbs the round-trips while the task thread extracts
  * (wall ≈ max(N, P)). The injected sleeps dominate both walls, so the
  * ratio is stable across CI noise.
  */
class AsyncDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("async-decode-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration.set(
      "fs.slowfs.impl", classOf[LatencyObjectStoreFs].getName)
  }
  override def afterAll(): Unit = {
    LatencyObjectStoreFs.reset()
    if (spark != null) {
      spark.sparkContext.hadoopConfiguration.unset("fs.slowfs.impl")
      spark.stop()
    }
  }

  private def scanWall(url: String, async: Boolean): Double = {
    val t0 = System.nanoTime()
    spark.read.format("warc")
      .option("async_decode", async)
      .load(url)
      .filter(col("record_type") === "response")
      .select(length(graft.functions.Web.extractPlainText(
        col("http_body"), col("http_charset"))).as("text_len"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  test("async_decode hides injected network round-trips: >=1.5x faster " +
      "scan+extract wall over a latency-shimmed object-store stream " +
      "(and byte-identical results)") {
    val tmp = System.getProperty("java.io.tmpdir")
    // ONE ~27 MB gzip archive (200 fixture copies, 3,200 response
    // pages) so the A/B is a single task: per-task pipelining is what
    // the option changes
    val dir = BenchCorpus.ensure(s"$tmp/graft_async_corpus",
      files = 1, copiesPerFile = 200)
    val url = s"slowfs://$dir/bench-000.warc.gz"
    try {
      // results must be identical before any timing claim
      LatencyObjectStoreFs.perReadMicros = 0L
      def totals(async: Boolean): (Long, Long) = {
        val r = spark.read.format("warc").option("async_decode", async)
          .load(url).filter(col("record_type") === "response")
          .agg(count(lit(1)), sum(length(col("http_body")))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val (nSync, bSync) = totals(async = false)
      assert(nSync == 3200L, s"corpus shape drifted: $nSync pages")
      assert(totals(async = true) == ((nSync, bSync)),
        "async_decode changed scan results")
      // the latency regime: 1 ms per <=16 KiB read
      LatencyObjectStoreFs.perReadMicros = 1000L
      LatencyObjectStoreFs.maxChunkBytes = 16 * 1024
      scanWall(url, async = false) // warm (page cache, codegen, JIT)
      scanWall(url, async = true)
      // min-of-3 per mode (the bench doctrine: min is the
      // least-interfered wall; interleaving shares any window drift)
      val syncWalls = Seq.fill(3)(scanWall(url, async = false))
      val asyncWalls = Seq.fill(3)(scanWall(url, async = true))
      val ratio = syncWalls.min / asyncWalls.min
      info(f"sync=${syncWalls.min}%.2f s  async=${asyncWalls.min}%.2f s  " +
        f"ratio=$ratio%.2f (sync runs ${syncWalls.map(w => f"$w%.2f").mkString("/")}, " +
        f"async ${asyncWalls.map(w => f"$w%.2f").mkString("/")})")
      assert(ratio >= 1.5,
        f"async_decode won only $ratio%.2fx in its claimed latency regime " +
        f"(sync ${syncWalls.min}%.2f s vs async ${asyncWalls.min}%.2f s) — " +
        "the option's reason to exist is a >=1.5x win here")
    } finally LatencyObjectStoreFs.reset()
  }
}
