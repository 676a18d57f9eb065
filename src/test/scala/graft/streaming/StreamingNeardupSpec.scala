package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stateful streaming near-dup (d28's operator): the state transition
  * driven directly with a test GroupState, plus an end-to-end
  * two-micro-batch run over a crafted corpus.
  */
class StreamingNeardupSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingNeardup.{BandRow, BucketState, Verdict}

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("streaming-neardup-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Minimal GroupState double: exists/get/update. */
  private class TestState(private var v: Option[BucketState])
      extends org.apache.spark.sql.streaming.GroupState[BucketState] {
    def exists: Boolean = v.isDefined
    def get: BucketState = v.get
    def getOption: Option[BucketState] = v
    def update(s: BucketState): Unit = v = Some(s)
    def remove(): Unit = v = None
    def hasTimedOut: Boolean = false
    def setTimeoutDuration(ms: Long): Unit = ()
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(ms: Long): Unit = ()
    def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    def getCurrentWatermarkMs(): Long = 0L
    def getCurrentProcessingTimeMs(): Long = 0L
  }

  private def row(id: Long, h0: Long, h1: Long) = BandRow(id, h0, h1, 0, h0 & 65535L)

  test("same-batch ordering: the smaller doc_id witnesses, the larger matches") {
    val st = new TestState(None)
    val out = StreamingNeardup.update(3)((0, 0L),
      Iterator(row(20, 5L, 0L), row(10, 4L, 0L)), st).toSeq
    // sorted by doc_id: 10 first (no prior -> unmatched), 20 sees 10
    // (hamming(4^5)=bitcount(1)=1 <= 3 -> matched)
    assert(out == Seq(Verdict(10, 0, matched = false), Verdict(20, 0, matched = true)))
  }

  test("cross-batch state: an earlier batch's code suppresses a later arrival") {
    val st = new TestState(None)
    StreamingNeardup.update(3)((0, 0L), Iterator(row(1, 0xF0L, 0L)), st)
    val out2 = StreamingNeardup.update(3)((0, 0L),
      Iterator(row(2, 0xF1L, 0L), row(3, 0xFFFF000L, 0L)), st).toSeq
    assert(out2 == Seq(
      Verdict(2, 0, matched = true),   // hamming 1 from doc 1
      Verdict(3, 0, matched = false))) // far from everything
  }

  test("bucket cap + second-chance ring: the prefix stops growing at " +
      "MaxBucket, over-cap arrivals ride the 16-slot exact-dedup LRU " +
      "ring, and novel codes evict least-recently-seen-first") {
    val st = new TestState(None)
    // fill the prefix with 64 mutually-distant codes
    val fill = (0 until StreamingNeardup.MaxBucket).map(i =>
      row(i.toLong, i.toLong << 32, 0x1111L * i))
    StreamingNeardup.update(0)((0, 0L), fill.iterator, st)
    assert(st.get.h0s.length == StreamingNeardup.MaxBucket)
    // a 65th distinct code: unmatched, absorbed into the RING
    StreamingNeardup.update(0)((0, 0L),
      Iterator(row(100, 0xABCDL << 40, 0x9999L)), st)
    assert(st.get.h0s.length == StreamingNeardup.MaxBucket + 1)
    // an exact copy of a PREFIX code still matches (prefix doctrine) —
    // and, the prefix copy being permanent, it takes NO ring slot
    val out = StreamingNeardup.update(0)((0, 0L),
      Iterator(row(101, 5L << 32, 0x1111L * 5)), st).toSeq
    assert(out.head.matched)
    assert(st.get.h0s.length == StreamingNeardup.MaxBucket + 1,
      "a prefix-exact over-cap arrival must not consume a ring slot")
    // an exact copy of the over-cap 65th NOW matches (the second
    // chance a poisoned prefix used to deny forever) — it REFRESHES
    // the 65th's slot instead of taking a second one
    val out2 = StreamingNeardup.update(0)((0, 0L),
      Iterator(row(102, 0xABCDL << 40, 0x9999L)), st).toSeq
    assert(out2.head.matched)
    assert(st.get.h0s.length == StreamingNeardup.MaxBucket + 1,
      "an exact ring repeat must refresh in place, not duplicate")
    // 16 further DISTINCT over-cap codes evict the 65th least-recently-
    // seen-first; a fresh copy of the 65th no longer matches (the d29
    // 'ring' regime's information-theoretic bound: 17 distinct codes
    // cannot fit 16 slots under any admission policy)
    (0 until StreamingNeardup.RingSize).foreach { j =>
      StreamingNeardup.update(0)((0, 0L),
        Iterator(row(200L + j, 0x5EEDL << 40 | j.toLong, 0x4444L * j)), st)
    }
    val out3 = StreamingNeardup.update(0)((0, 0L),
      Iterator(row(300, 0xABCDL << 40, 0x9999L)), st).toSeq
    assert(!out3.head.matched)
    // state is bounded by construction: prefix + ring, never more
    assert(st.get.h0s.length <=
      StreamingNeardup.MaxBucket + StreamingNeardup.RingSize)
  }

  test("LRU ring property fuzz: 200 random arrival streams match an " +
      "independent naive simulator of the state rule") {
    // second implementation of the same semantics (plain lists, no
    // arrays/shifts) — catches index arithmetic bugs in the operator's
    // in-place refresh/evict paths. Codes drawn from a small pool so
    // repeats, prefix-exact hits, ring refreshes and evictions all
    // occur; a larger pool arm drives eviction-heavy streams.
    val rnd = new scala.util.Random(1517)
    (1 to 200).foreach { iter =>
      val poolSize = if (iter % 2 == 0) 12 else 40
      val pool = Vector.fill(poolSize)((rnd.nextLong(), rnd.nextLong()))
      val nArrivals = 120 + rnd.nextInt(160)
      val maxHamming = rnd.nextInt(4)
      // naive model state
      var prefix = Vector.empty[(Long, Long)]
      var ring = Vector.empty[(Long, Long)] // oldest-seen first
      val st = new TestState(None)
      (0 until nArrivals).foreach { i =>
        // a pool code verbatim (exact repeats: prefix-skip / ring
        // refresh) or with 1-4 bits flipped (near-matches at every
        // hamming distance around the threshold)
        val base = pool(rnd.nextInt(pool.size))
        val c = if (rnd.nextInt(3) > 0) base else {
          var (h0, h1) = base
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            val bit = rnd.nextInt(128)
            if (bit < 64) h0 ^= 1L << bit else h1 ^= 1L << (bit - 64)
          }
          (h0, h1)
        }
        def ham(a: (Long, Long)): Int =
          java.lang.Long.bitCount(a._1 ^ c._1) +
            java.lang.Long.bitCount(a._2 ^ c._2)
        val expectMatched = (prefix ++ ring).exists(ham(_) <= maxHamming)
        // naive transition
        if (prefix.size < StreamingNeardup.MaxBucket) prefix :+= c
        else if (prefix.contains(c)) () // permanent coverage, no slot
        else if (ring.contains(c)) ring = ring.filterNot(_ == c) :+ c
        else {
          if (ring.size == StreamingNeardup.RingSize) ring = ring.tail
          ring :+= c
        }
        val out = StreamingNeardup.update(maxHamming)((0, 0L),
          Iterator(row(i.toLong, c._1, c._2)), st).toSeq
        assert(out.head.matched == expectMatched,
          s"iter $iter arrival $i: operator=${out.head.matched} naive=$expectMatched")
        // state must mirror the model exactly (prefix ++ ring order)
        val got = st.get.h0s.zip(st.get.h1s).toVector
        assert(got == prefix ++ ring,
          s"iter $iter arrival $i: state diverged from the model")
      }
    }
  }

  test("LRU ring survives repeat-heavy over-cap churn: a witness stays " +
      "alive through 20 interleaved arrivals drawn from 8 codes (the " +
      "d29 'churn' regime — the r14 cyclic ring evicted it)") {
    val st = new TestState(None)
    val fill = (0 until StreamingNeardup.MaxBucket).map(i =>
      row(i.toLong, i.toLong << 32, 0x1111L * i))
    StreamingNeardup.update(0)((0, 0L), fill.iterator, st)
    // clone A arrives over-cap (rank 65)
    StreamingNeardup.update(0)((0, 0L),
      Iterator(row(100, 0x7777L << 40, 0x2222L)), st)
    // 20 over-cap arrivals from only 8 distinct codes: 8 admissions +
    // 12 in-place refreshes — ring occupancy stays at 9
    (0 until 20).foreach { j =>
      StreamingNeardup.update(0)((0, 0L),
        Iterator(row(200L + j, 0xBEEFL << 40 | (j % 8).toLong, 0x3333L)), st)
    }
    assert(st.get.h0s.length == StreamingNeardup.MaxBucket + 9,
      "8 distinct codes + the witness must occupy exactly 9 ring slots")
    // the twin still matches A — and each repeated filler matched its
    // own earlier occurrence (checked via the last repeat)
    val twin = StreamingNeardup.update(0)((0, 0L),
      Iterator(row(300, 0x7777L << 40, 0x2222L)), st).toSeq
    assert(twin.head.matched,
      "LRU ring must keep a witness alive through repeat churn")
    val repeat = StreamingNeardup.update(0)((0, 0L),
      Iterator(row(301, 0xBEEFL << 40 | 3L, 0x3333L)), st).toSeq
    assert(repeat.head.matched)
  }

  test("end-to-end: two landed waves, verdicts match the batch pair set") {
    val s = spark
    import s.implicits._
    val landing = java.nio.file.Files.createTempDirectory("neardup-landing")
    // wave 0: docs 1 (code A), 2 (code B). wave 1: 3 (= A), 4 (~B, 1 bit), 5 (far)
    val a = (0x1234567890ABCDEFL, 0x0F0F0F0F0F0F0F0FL)
    val b = (0x7777777777777777L, 0x3333333333333333L)
    def wave(rows: Seq[(Long, Long, Long)], name: String): Unit =
      rows.toDF("doc_id", "h0", "h1").coalesce(1)
        .write.mode("append").parquet(landing.toString)
    wave(Seq((1L, a._1, a._2), (2L, b._1, b._2)), "w0")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType)))
    val verdicts = StreamingNeardup.bandVerdicts(
      spark.readStream.schema(schema).parquet(landing.toString))
    val q = verdicts.writeStream.format("memory").queryName("neardup_spec")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      wave(Seq((3L, a._1, a._2), (4L, b._1, b._2 ^ 1L), (5L, 0L, 0L)), "w1")
      q.processAllAvailable()
    } finally q.stop()
    val supp = spark.table("neardup_spec").groupBy(col("doc_id"))
      .agg(max(col("matched")).as("m")).filter(col("m")).select(col("doc_id"))
      .as[Long].collect().toSet
    // 3 = exact copy of 1; 4 = hamming-1 of 2; 1/2/5 unmatched
    assert(supp == Set(3L, 4L))
  }

  test("restart: bucket state survives a stop/resume from checkpoint") {
    val s = spark
    import s.implicits._
    val landing = java.nio.file.Files.createTempDirectory("neardup-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("neardup-restart-ckpt").toString
    val a = (0x1234567890ABCDEFL, 0x0F0F0F0F0F0F0F0FL)
    def wave(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("doc_id", "h0", "h1").coalesce(1)
        .write.mode("append").parquet(landing.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType)))
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Boolean)]())
    def verdicts = StreamingNeardup.bandVerdicts(
      spark.readStream.schema(schema).parquet(landing.toString))
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def start() = verdicts.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingNeardup.Verdict], _: Long) =>
          df.collect().foreach(v => seen.add((v.doc_id, v.matched)))
      }.start()

    wave(Seq((1L, a._1, a._2)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // wave 0 committed, query killed
    seen.clear() // only post-restart emissions matter below

    wave(Seq((2L, a._1, a._2))) // exact copy, lands AFTER the stop
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // the resumed query must still know doc 1's code: doc 2 matches in
    // every band, and doc 1 is NOT re-emitted (offsets resumed, no replay)
    val rows = seen.toArray(Array.empty[(Long, Boolean)]).toSeq
    assert(rows.forall(_._1 == 2L), s"wave 0 must not replay: $rows")
    assert(rows.length == 4 && rows.forall(_._2),
      s"state lost across restart: $rows")
  }

  test("soak: 50 waves with a kill every 8, state rows flat at the bucket " +
      "count, verdicts exactly-once and equal to the single-bucket model") {
    val s = spark
    import s.implicits._
    val landing = java.nio.file.Files.createTempDirectory("neardup-soak")
    val ckpt = java.nio.file.Files.createTempDirectory("neardup-soak-ckpt").toString
    // All codes share their LOW 32 bits per half (band keys come from
    // bits 0..31), so the 50 waves exercise a FIXED set of buckets —
    // the flat-state assertion below is meaningful, and the cap-pusher
    // family (distinct high bits every wave, 2/wave = 100 > MaxBucket)
    // drives its shared buckets past the 64-code cap mid-soak.
    val aLo0 = 0x9ABCDEF0L; val aLo1 = 0x12344321L
    val pLo0 = 0xABCD1234L; val pLo1 = 0x5555AAAAL
    def waveRows(w: Int): Seq[(Long, Long, Long)] = Seq(
      (w * 10L + 1, 0x12345678L << 32 | aLo0, 0x0F0FF0F0L << 32 | aLo1), // repeat of A
      (w * 10L + 2, (0x12345678L << 32 | aLo0) ^ (1L << 40), 0x0F0FF0F0L << 32 | aLo1), // hamming-1 of A
      (w * 10L + 3, (w * 2L + 101) << 34 | pLo0, (w * 31L + 7) << 36 | pLo1), // cap pusher
      (w * 10L + 4, (w * 2L + 102) << 34 | pLo0, (w * 37L + 11) << 36 | pLo1)) // cap pusher
    val nWaves = 50
    // expected = the pinned single-bucket transition replayed per bucket
    // in wave order (micro-batch = wave by construction below)
    val expected = {
      val states = scala.collection.mutable.Map[(Int, Long), TestState]()
      val out = Vector.newBuilder[(Long, Int, Boolean)]
      for (w <- 0 until nWaves) {
        waveRows(w)
          .flatMap { case (id, h0, h1) => Seq(
            BandRow(id, h0, h1, 0, h0 & 65535L),
            BandRow(id, h0, h1, 1, (h0 >> 16) & 65535L),
            BandRow(id, h0, h1, 2, h1 & 65535L),
            BandRow(id, h0, h1, 3, (h1 >> 16) & 65535L))
          }
          .groupBy(r => (r.band_id, r.bkey))
          .foreach { case (k, rs) =>
            val st = states.getOrElseUpdate(k, new TestState(None))
            StreamingNeardup.update(3)(k, rs.iterator, st)
              .foreach(v => out += ((v.doc_id, v.band_id, v.matched)))
          }
      }
      (out.result().sorted, states.size)
    }
    val (expectedVerdicts, nBuckets) = expected
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType)))
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Int, Boolean)]())
    def start() = StreamingNeardup.bandVerdicts(
        spark.readStream.schema(schema).parquet(landing.toString))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingNeardup.Verdict], _: Long) =>
          df.collect().foreach(v => seen.add((v.doc_id, v.band_id, v.matched)))
      }.start()
    var q = start()
    val stateRows = Vector.newBuilder[(Int, Long)]
    try {
      for (w <- 0 until nWaves) {
        waveRows(w).toDF("doc_id", "h0", "h1").coalesce(1)
          .write.mode("append").parquet(landing.toString)
        q.processAllAvailable()
        Option(q.lastProgress).filter(_.stateOperators.nonEmpty)
          .foreach(p => stateRows += ((w, p.stateOperators.head.numRowsTotal)))
        if (w % 8 == 7 && w < nWaves - 1) { q.stop(); q = start() } // periodic kill
      }
    } finally q.stop()
    val got = seen.toArray(Array.empty[(Long, Int, Boolean)]).toVector.sorted
    assert(got.size == nWaves * 4 * 4, s"exactly-once broken: ${got.size} verdicts")
    assert(got == expectedVerdicts, "soak verdicts diverged from the model")
    // state stays FLAT at the bucket count once every bucket has
    // appeared — the 64-cap means 100 pusher codes never grow it
    val late = stateRows.result().filter(_._1 >= 2).map(_._2).distinct
    assert(late == Vector(nBuckets.toLong),
      s"state rows not flat at $nBuckets: $late")
  }
}
