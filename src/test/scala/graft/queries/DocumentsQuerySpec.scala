package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Deployment-shape properties of the documents queries: cache hygiene of
  * the near-dup pipeline and cluster-portability of the bulk-sink landing
  * path (executor writes must go through the shared filesystem, not
  * executor-local temp dirs).
  */
class DocumentsQuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false").appName("documents-query-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"alpha beta gamma delta epsilon token$i end"))
      .toDF("doc_id", "text")
  }

  test("t11 BPE pre-tokenizer: classes and counts on known text") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("I'm sure we've seen 42 cats!").toDF("text")
      .select(regexp_extract_all(col("text"), lit(Documents.BpePattern), lit(0)).as("toks"))
    val toks = df.collect()(0).getSeq[String](0)
    // contraction split off the word; numbers and punctuation keep
    // their leading space; final '!' is a bare punctuation run
    assert(toks == Seq("I", "'m", " sure", " we", "'ve", " seen", " 42", " cats", "!"))
  }

  test("t28 BPE encode: trained merges fuse words exactly (tiny corpus)") {
    val s = spark
    import s.implicits._
    // Hand-derived merges: m1=(h,e) (ties to (t,h) broken lexically),
    // m2=(t,he), m3=(a,t) -> 'the' encodes to 1 token, 'cat'/'sat' to 2.
    val dir = java.nio.file.Files.createTempDirectory("graft_t28").toString
    Seq((0L, "the the the cat"), (1L, "the cat sat"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Documents.queries("t28_bpe_encode")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq((0L, 4L, 12L, 5L, 2.4), (1L, 3L, 9L, 5L, 1.8)))
  }

  test("t28 BPE encode: a corpus with no mergeable pair is a fuse no-op, " +
      "never a row annihilator") {
    val s = spark
    import s.implicits._
    // every normalized word is a single letter -> bpeWords' >=2-char
    // filter leaves training EMPTY; the encode must still emit per-doc
    // rows (one token per character) instead of crossJoin-ing to zero
    val dir = java.nio.file.Files.createTempDirectory("graft_t28e").toString
    Seq((0L, "a b c"), (1L, "x y"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Documents.queries("t28_bpe_encode")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 3L, 3L), (1L, 2L, 2L)))
  }

  test("t12 PII redaction scrubs emails, IPs and phones in order") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val out = Documents.queries("t12_pii_redact")(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 1000000L).collect()
    assert(out.length == 3)
    // crafted row 1000000: one email, one phone
    assert(out(0).getLong(1) == 1L && out(0).getLong(3) == 1L)
    // crafted row 1000001: two IPs, zero emails (admin@local has no TLD)
    assert(out(1).getLong(2) == 2L && out(1).getLong(1) == 0L)
  }

  test("t17 quality rules: flags and keep on crafted pass/fail docs") {
    val s = spark
    import s.implicits._
    // doc 0: 52 words, 2 distinct stopwords -> keep. doc 1: 10 words ->
    // fails word count only. doc 2: symbol soup -> fails symbol + alpha
    // + stop rules. doc 3: lorem ipsum -> fails C4.
    val docsDf = Seq(
      (0L, ("the of system values " * 13).trim), // 52 words, mean len 4.25
      (1L, "a of short text here now then soon yes no"),
      (2L, ("### ... " * 30).trim),
      (3L, "lorem ipsum " + ("of and " * 25).trim)).toDF("doc_id", "text")
    val crafted = Documents.qualityRules(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(crafted(0L).getAs[Boolean]("keep"))
    assert(!crafted(1L).getAs[Boolean]("pass_word_count") &&
      crafted(1L).getAs[Boolean]("pass_stop") &&
      !crafted(1L).getAs[Boolean]("keep"))
    assert(!crafted(2L).getAs[Boolean]("pass_symbol") &&
      !crafted(2L).getAs[Boolean]("pass_alpha") &&
      !crafted(2L).getAs[Boolean]("pass_stop"))
    assert(!crafted(3L).getAs[Boolean]("pass_c4") &&
      !crafted(3L).getAs[Boolean]("keep"))
  }

  test("t18 bigram perplexity: hand-computed Laplace scores on a 2-doc corpus") {
    val s = spark
    import s.implicits._
    val docsDf = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = Documents.bigramPerplexity(docsDf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // corpus bigrams: doc0 = (a b)(b a)(a b), doc1 = (a b)(b c)
    // counts: c(a b)=3, c(b a)=1, c(b c)=1; prefix c(a .)=3, c(b .)=2; V=3
    // P(b|a)=(3+1)/(3+3)=2/3; P(a|b)=(1+1)/(2+3)=2/5; P(c|b)=2/5
    val lp0 = (math.log(2.0 / 3) + math.log(2.0 / 5) + math.log(2.0 / 3)) / 3
    val lp1 = (math.log(2.0 / 3) + math.log(2.0 / 5)) / 2
    assert(out(0L)._1 == 3L && out(1L)._1 == 2L)
    assert(math.abs(out(0L)._2 - BigDecimal(lp0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(1L)._2 - BigDecimal(lp1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(0L)._3 - math.rint(math.exp(-lp0) * 100) / 100) < 1e-9)
  }

  test("t29 KN perplexity: hand-computed interpolated scores, and the " +
      "model normalizes to 1 over the vocabulary per context") {
    val s = spark
    import s.implicits._
    val docsDf = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = Documents.knPerplexity(docsDf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // bigram types: (a b) c=3, (b a) c=1, (b c) c=1 -> N1+(a.)=1,
    // N1+(b.)=2, c(a)=3, c(b)=2; continuation: N1+(.b)=1, N1+(.a)=1,
    // N1+(.c)=1, total types T=3
    val D = 0.75
    def p(cBg: Double, cW1: Double, fw: Double, bw: Double) =
      math.max(cBg - D, 0) / cW1 + D * fw / cW1 * bw / 3.0
    val pBgivenA = p(3, 3, 1, 1) // P(b|a)
    val pAgivenB = p(1, 2, 2, 1) // P(a|b)
    val pCgivenB = p(1, 2, 2, 1) // P(c|b)
    val lp0 = (math.log(pBgivenA) + math.log(pAgivenB) + math.log(pBgivenA)) / 3
    val lp1 = (math.log(pBgivenA) + math.log(pCgivenB)) / 2
    assert(out(0L)._1 == 3L && out(1L)._1 == 2L)
    assert(math.abs(out(0L)._2 - BigDecimal(lp0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(1L)._2 - BigDecimal(lp1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(0L)._3 - math.rint(math.exp(-lp0) * 100) / 100) < 1e-9)
    // Chen & Goodman sanity: sum over the FULL vocab {a,b,c} of P(.|w1)
    // is exactly 1 (unseen continuations score lambda(w1) * Pcont(w2))
    def lambda(cW1: Double, fw: Double) = D * fw / cW1
    val sumA = pBgivenA + lambda(3, 1) * (1 / 3.0) + lambda(3, 1) * (1 / 3.0)
    val sumB = pAgivenB + pCgivenB + lambda(2, 2) * (1 / 3.0)
    assert(math.abs(sumA - 1.0) < 1e-12 && math.abs(sumB - 1.0) < 1e-12)
  }

  test("d22 simhash near-dup: injected exact copies surface at hamming 0; " +
      "every reported pair is within the threshold") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val rows = Documents.queries("d22_simhash_neardup")(s, "/root/testdata/sf0.001")
      .collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 5L).foreach { i =>
      assert(pairs.get((i, i + 3000000L)).contains(0L),
        s"exact copy of doc $i must pair at hamming 0; got ${pairs.get((i, i + 3000000L))}")
    }
    rows.foreach(r => assert(r.getLong(2) <= 3))
    // banding recall guarantee: every <=3 pair among the injected ids
    // must have been FOUND (pigeonhole: 4 bands, <=3 differing bits)
    assert(rows.length >= 5)
  }

  test("d22 at cluster scale reuses the band exchange (simhash kernel " +
      "runs once)") {
    // codes ride the band rows, so under sort-merge joins (the 100 TB
    // regime — force it by disabling broadcast) the guard and both
    // self-join sides hang off ONE (band_id, bkey) exchange and AQE
    // must dedup it into ReusedExchange reads instead of re-running
    // the SimHash kernel per consumer
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Documents.queries("d22_simhash_neardup")(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert("ReusedExchange".r.findAllIn(plan).nonEmpty, plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("d23 calibration: hamming 0 means Jaccard 1.0; levels partition " +
      "the d22 pair set") {
    val s = spark
    val gauge = Documents.queries("d23_simhash_gauge")(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // hamming 0 is dominated by the exact copies but ALSO catches
    // one-token-appended twins whose sign counters never flip — the
    // simhash property the gauge exists to quantify: mean Jaccard
    // stays near-1 and every hamming-0 pair clears the dedup bar
    assert(gauge.contains(0L))
    assert(gauge(0L)._2 >= 0.98 && gauge(0L)._3 == gauge(0L)._1)
    // the gauge's pair count equals d22's output size (same pipeline)
    val n22 = Documents.queries("d22_simhash_neardup")(s, "/root/testdata/sf0.001")
      .count()
    assert(gauge.values.map(_._1).sum == n22)
  }

  test("t30 temperature mix: weights normalize, head damped, tail boosted") {
    val s = spark
    val rows = Documents.queries("t30_temperature_mix")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3) // p sums to 1
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3) // q sums to 1
    // sqrt damping: the largest source gets the smallest boost and
    // vice versa; every boost is q/p
    val byP = rows.sortBy(_._3)
    assert(byP.last._5 <= byP.head._5)
    rows.foreach { case (_, _, p, q, boost) =>
      assert(math.abs(boost - q / p) < 2e-4)
    }
  }

  test("d09 paragraph dedup keeps the first occurrence of shared boilerplate") {
    val s = spark
    import org.apache.spark.sql.functions._
    val out = Documents.queries("d09_paragraph_dedup")(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 2000000L).collect()
    assert(out.length == 50)
    // first injected doc keeps all 3 paragraphs; later ones lose the
    // shared boilerplate paragraph
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 3L)
    out.tail.foreach(r => assert(r.getLong(1) == 3L && r.getLong(2) == 2L))
  }

  test("d10 decontamination flags the benchmark docs at full overlap") {
    val s = spark
    import org.apache.spark.sql.functions._
    val out = Documents.queries("d10_decontaminate")(s, "/root/testdata/sf0.001").collect()
    val flagged = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(flagged.contains(3L) && flagged(3L) == 1.0)
    assert(flagged.contains(7L) && flagged(7L) == 1.0)
  }

  test("neardupSummary leaves no cached intermediates behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Documents.neardupSummary(corpus(200))
    assert(out.count() == 1)
    // the eager localCheckpoint of the 1-row summary is the only cache
    // that may remain; the five persisted intermediates must all be gone
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("neardupSummary with a checkpoint dir uses reliable checkpointing") {
    val cd = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Documents.neardupSummary(corpus(100), checkpointDir = Some(cd))
    assert(out.count() == 1)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
    assert(new java.io.File(cd).listFiles().nonEmpty) // checkpoint landed
  }

  test("d11/d12 neardup clusters: each synthetic chain clusters to its min doc_id") {
    val s = spark
    import org.apache.spark.sql.functions._
    // the propagation-level properties live in ConnectedComponentsSpec;
    // here: the end-to-end pipeline, via BOTH component algorithms
    for (q <- Seq("d11_neardup_clusters", "d12_clusters_stars")) {
      val out = Documents.queries(q)(s, "/root/testdata/sf0.001")
        .filter(col("doc_id") >= 3000000L).collect()
      // 5 chains x 3 docs, all clustered; a~b and b~c are verified dups
      // (Jaccard 0.667) while a!~c (0.429) — connected components must
      // still put all three in one cluster labeled by the chain's min id
      assert(out.length == 15, q)
      out.foreach { r =>
        val (id, cluster, size) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(cluster == 3000000L + 3 * ((id - 3000000L) / 3), q)
        assert(size == 3L, q)
      }
    }
  }

  test("d16 LSH gauge: chains recalled, candidates precise, truth saturated") {
    val s = spark
    val out = Documents.queries("d16_lsh_gauge")(s, "/root/testdata/sf0.001").head
    val (nTruth, nCand, nHit) = (out.getLong(1), out.getLong(2), out.getLong(3))
    // the 5 synthetic chains contribute 10 exact-verified dup pairs
    // (a~b, b~c each; a~c sits below the 0.5 threshold) and their stems
    // are built to collide in at least one band — they must be HIT
    assert(nTruth >= 10L)
    assert(nHit >= 10L, s"chain pairs missing from hits: $nHit")
    // what the gauge is FOR (see the registry comment): the tiny
    // vocabulary saturates set-Jaccard truth (most doc pairs qualify),
    // sequence-targeted banding surfaces few but precise candidates
    assert(out.getDouble(4) >= 0.5, s"precision ${out.getDouble(4)}")
    assert(nHit <= nTruth && nHit <= nCand)
  }

  test("d17 bloom gate: clones flagged, nothing missed") {
    val s = spark
    val out = Documents.queries("d17_bloom_gate")(s, "/root/testdata/sf0.001").head
    val (nIncoming, nFlagged, nTrue, nFp, nMissed) =
      (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
    assert(nTrue > 0L, "clone injection must create true dups")
    assert(nMissed == 0L, "a bloom filter can never false-negative")
    assert(nFlagged == nTrue + nFp)
    assert(nIncoming > nTrue)
  }

  test("d13 similar top-k ranks the closer chain neighbor first") {
    val s = spark
    import org.apache.spark.sql.functions._
    val out = Documents.queries("d13_similar_topk")(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 3000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // chain a~b~c: for the middle doc b the two neighbors a and c tie on
    // jaccard (0.667 each) -> deterministic tie-break by other_id puts a
    // (the smaller id) at rank 1; the chain ends rank their adjacent
    // middle doc first (0.667) ahead of the far end (0.429) if the far
    // pair even surfaced as an LSH candidate
    val b = 3000001L
    assert(out((b, 1L))._1 == 3000000L && out((b, 1L))._2 > 0.6)
    assert(out((b, 2L))._1 == 3000002L && out((b, 2L))._2 > 0.6)
    assert(out((3000000L, 1L))._1 == b)
    assert(out((3000002L, 1L))._1 == b)
  }

  test("d15 dup pagerank: a chain's middle doc out-ranks its ends") {
    val s = spark
    import org.apache.spark.sql.functions._
    val out = Documents.queries("d15_dup_pagerank")(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 3000000L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // each chain a~b~c contributes edges (a,b) and (b,c): b is the most
    // central member, so b must carry the highest rank of its chain —
    // the representative a centrality-based keeper would choose
    for (k <- 0 until 5) {
      val base = 3000000L + 3 * k
      assert(out(base + 1) > out(base) && out(base + 1) > out(base + 2),
        s"chain $k middle must out-rank ends")
      assert(out(base) == out(base + 2), s"chain $k ends are symmetric")
    }
  }

  test("d14 substring dups: shared boilerplate is flagged, unique text is not") {
    val s = spark
    import s.implicits._
    // docs 0 and 1 share a long boilerplate sentence; doc 2 is disjoint
    val boiler = "subscribe to our newsletter for updates every week"
    val docsDf = Seq(
      (0L, s"alpha content one $boiler"),
      (1L, s"totally different beta body $boiler"),
      (2L, "zq xv jk wm unrelated pq rs tuvly entirely")).toDF("doc_id", "text")
    val out = Documents.substringDups(docsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L)._2 > 0L && out(1L)._2 > 0L, "shared boilerplate must be detected")
    assert(out(2L)._2 == 0L && out(2L)._3 == 0.0, "disjoint text shares nothing")
    assert(out(0L)._3 > 0.0 && out(0L)._3 <= 1.0)
  }

  test("neardupClusters leaves no cached intermediates behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Documents.neardupClusters(corpus(200))
    out.count()
    // propagation localCheckpoints (id,label) frames; the LSH stage
    // persists must all be released
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 2)
  }

  test("t09 bulk sink lands deterministic part files on the shared warehouse FS") {
    val res = Documents.queries("t09_bulk_sink")(spark, "/root/testdata/sf0.001")
      .collect().head
    val landing = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + "/graft_bulk_t09")
    val parts = landing.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq // .crc sidecars are hidden
    // deterministic names (no UUIDs), one per partition, no temp leftovers
    assert(parts == (0 until 4).map(i => f"part-$i%05d.jsonl"))
    // and the readback totals match the source table exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    assert(res.getLong(0) == n && res.getLong(1) == n)
  }

  test("bucketed fingerprint tables join with zero exchanges") {
    import org.apache.spark.sql.functions._
    // The 100 TB posture for persistent dedup state: the corpus
    // fingerprint index and each incoming snapshot's fingerprints are
    // written bucketBy(fp), so the keeper join is co-located — no
    // shuffle of either side, ever. This pins the plan property the
    // SCALING.md §3 knob claims.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(md5(col("text")).as("fp"), col("doc_id"))
    docs.write.mode("overwrite")
      .bucketBy(8, "fp").sortBy("fp").saveAsTable("graft_fp_index")
    docs.withColumn("doc_id", col("doc_id") + 1000000L).write.mode("overwrite")
      .bucketBy(8, "fp").sortBy("fp").saveAsTable("graft_fp_incoming")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val joined = spark.table("graft_fp_index")
        .join(spark.table("graft_fp_incoming"), "fp")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == docs.count()) // fp is unique per doc here
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_fp_index")
      spark.sql("DROP TABLE IF EXISTS graft_fp_incoming")
    }
  }

  test("d09 paragraphDedup: carryText mode is row-identical to the re-join mode") {
    import org.apache.spark.sql.functions._
    // real corpus plus injected boilerplate sharing a middle paragraph
    // (the case where the two topologies could plausibly diverge)
    val extra = spark.range(50).select((col("id") + 2000000L).as("doc_id"),
      concat(lit("intro segment "), col("id").cast("string"),
        lit(". shared boilerplate cookie notice. unique tail "),
        col("id").cast("string")).as("text"))
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).unionAll(extra)
    def rows(carry: Boolean) =
      Documents.paragraphDedup(all, carryText = carry)
        .select("doc_id", "idx", "par").orderBy("doc_id", "idx")
        .collect().toSeq
    val rejoin = rows(carry = false)
    val carried = rows(carry = true)
    assert(rejoin == carried)
    // boilerplate survived exactly once: doc 2000000 keeps 3 paragraphs,
    // the other 49 keep 2
    val kept = carried.filter(_.getLong(0) >= 2000000L)
      .groupBy(_.getLong(0)).view.mapValues(_.size).toMap
    assert(kept(2000000L) == 3 && kept.count(_._2 == 2) == 49)
  }

  test("t31 shard layout: shards partition the corpus and the layout is " +
      "a deterministic permutation") {
    val s = spark
    def run() = Documents.queries("t31_shard_layout")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val a = run()
    val total = s.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // every shard id in [0, 8), no shard empty at 500 docs, counts
    // partition the corpus exactly
    assert(a.map(_._1).toSeq == a.map(_._1).toSeq.sorted)
    assert(a.forall(t => t._1 >= 0 && t._1 < 8))
    assert(a.map(_._2).sum == total)
    // hash-uniform balance: no shard further than 2x from the mean
    val mean = total.toDouble / a.length
    a.foreach(t => assert(t._2 > mean / 2 && t._2 < mean * 2))
    // re-running reproduces the identical per-shard byte layout
    assert(run().toSeq == a.toSeq)
  }

  test("t32 resample exec: tail bins upsampled, head bins downsampled, " +
      "copy counts within the stochastic-rounding envelope") {
    val s = spark
    val rows = Documents.queries("t32_resample_exec")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.length >= 5)
    // factor decreases as bin size grows (temperature damping)
    val byN = rows.sortBy(_._2)
    assert(byN.head._3 > 1.0 && byN.last._3 < 1.0)
    assert(byN.map(_._3).reverse.toSeq == byN.map(_._3).reverse.toSeq.sorted)
    rows.foreach { case (_, n, factor, nOut, realized) =>
      // floor(f)*n <= n_out <= ceil(f)*n — stochastic rounding never
      // leaves the unit envelope around f*n
      assert(nOut >= math.floor(factor).toLong * n)
      assert(nOut <= math.ceil(factor).toLong * n)
      assert(math.abs(realized - nOut.toDouble / n) < 1e-4)
    }
  }

  test("d24 LSH plan: wider bands catch earlier (more FP), taller bands " +
      "catch later (more FN), and the production point sits between") {
    val s = spark
    val rows = Documents.queries("d24_lsh_plan")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8, 16))
    rows.foreach { case (r, b, _, _, _) => assert(r * b == 128) }
    // s50 grid threshold strictly increases with r; FP mass strictly
    // decreases; FN mass is non-decreasing
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted &&
      rows.map(_._3).distinct.length == 4)
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted.reverse &&
      rows.map(_._4).distinct.length == 4)
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted)
    // the production choice (r=8, b=16) crosses 50% at s=0.70, below
    // the 0.8 dedup bar but above the r=4 noise floor
    val prod = rows.find(_._1 == 8).get
    assert(prod._3 == 70L)
  }

  test("d25 suffix dups: hand-derived counters, and the partitioned window " +
      "equals the single global window exactly") {
    val s = spark
    import s.implicits._
    // phrase P (45 chars) shared by docs 0/1; doc 2 repeats a 15-char
    // phrase internally (below every threshold); doc 3 is unique.
    // Word-start suffix LCPs across docs 0/1: shared..=46, boiler..=39,
    // cookie..=27, consent..=20, notice..=12, text..=5
    // -> lcp20: 4 pairs, lcp30: 2, lcp40: 1, lcp64: 0, cross30: 2
    val phrase = "shared boilerplate cookie consent notice text"
    val docs = Seq(
      (0L, s"alpha $phrase omega"),
      (1L, s"beta $phrase gamma"),
      (2L, "repeat me twice repeat me twice tail"),
      (3L, "entirely unique content here")).toDF("doc_id", "text")
    def counters(prefixLen: Int) = {
      val r = Documents.suffixDups(docs, prefixLen).collect()(0)
      (0 to 5).map(r.getLong).toSeq
    }
    val part = counters(4)
    assert(part == Seq(27L, 4L, 2L, 1L, 0L, 2L))
    // prefixLen = 0 degenerates to ONE global window — the boundary-loss
    // argument (lost pairs have LCP < prefixLen < every threshold) says
    // the distributed counters must be identical
    assert(counters(0) == part)
  }

  test("d25 suffix dups: partition/global equivalence holds on the real corpus") {
    val s = spark
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val part = Documents.suffixDups(d, prefixLen = 4).collect()(0).toSeq
    val glob = Documents.suffixDups(d, prefixLen = 0).collect()(0).toSeq
    assert(part == glob)
  }

  test("d26 span removal: matches a brute-force reference on a crafted " +
    "corpus (cross-doc dups, within-doc overlap-merged islands, passthrough)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val win = 12
    val phrase = "lorem ipsum dolor sit amet consectetur"
    val docsSeq: Seq[(Long, String)] = Seq(
      // the phrase twice in one doc (overlapping flagged windows must
      // merge into islands) and once in another (cross-doc dup)
      (0L, s"intro words $phrase middle filler $phrase tail end"),
      (1L, s"other beginning $phrase closing words"),
      // nothing shared: must pass through untouched
      (2L, "completely unique text with no repeats whatsoever at all"),
      // shorter than the window: no flaggable starts
      (3L, "tiny doc"))
    // brute-force reference
    val all = for {
      (id, t) <- docsSeq
      p <- 1 to t.length
      if (p == 1 || t.charAt(p - 2) == ' ') && t.charAt(p - 1) != ' ' &&
        p + win <= t.length + 1
    } yield (id, p, t.substring(p - 1, p - 1 + win))
    val dup = all.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = docsSeq.map { case (id, t) =>
      val fl = all.collect { case (i, p, w) if i == id && dup(w) => p }.sorted
      // merge [p, p+win) intervals
      val islands = fl.foldLeft(List.empty[(Int, Int)]) { case (acc, p) =>
        acc match {
          case (s0, e0) :: rest if p <= e0 => (s0, math.max(e0, p + win)) :: rest
          case _ => (p, p + win) :: acc
        }
      }.reverse
      val cleaned = {
        val sb = new StringBuilder
        var pos = 1
        for ((s0, e0) <- islands) { sb.append(t.substring(pos - 1, s0 - 1)); pos = e0 }
        sb.append(t.substring(pos - 1)).toString
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, fl.size.toLong, islands.size.toLong,
        islands.map(x => x._2 - x._1).sum.toLong, cleaned.length.toLong, md)
    }
    // sanity on the fixture itself: doc0 must have MERGED islands
    // (more flagged starts than islands) and doc2/3 pass through
    assert(expected(0)._2 > expected(0)._3 && expected(0)._3 >= 1)
    assert(expected(2)._4 == 0L && expected(3)._4 == 0L)
    val got = Documents.spanRemoval(docsSeq.toDF("doc_id", "text"), win)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(got == expected)
  }

  test("t35 Heaps' law: the curve is the exact distinct-count at every " +
    "prefix and beta lands in the sublinear band on the real corpus") {
    val s = spark
    val df = Documents.queries("t35_heaps_law")(s, "/root/testdata/sf0.01")
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0 until 10))
    // brute-force check: distinct types among docs in each prefix
    val docsDf = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1)))
    val n = docsDf.length
    rows.foreach { case (dec, nDocsCum, nToksCum, nTypesCum, _) =>
      val prefix = docsDf.filter { case (id, _) =>
        math.min(math.floor(id * 10.0 / n).toInt, 9) <= dec }
      val toks = prefix.flatMap(_._2.trim.split("\\s+"))
      assert(nDocsCum == prefix.length)
      assert(nToksCum == toks.length)
      assert(nTypesCum == toks.distinct.length)
    }
    // cumulative counts are monotone; on THIS corpus the ~40-word
    // vocabulary saturates in decile 0, so beta is exactly 0 — the
    // curve correctly reports a closed vocabulary
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(rows.head._5 == 0L && rows.last._4 == rows.head._4)

    // genuine sublinear growth: doc i introduces ~2*sqrt growth of new
    // types; beta must land strictly inside (0, 1)
    import s.implicits._
    val grown = (0 until 200).map { i =>
      val vocabTop = 2 * math.sqrt((i + 1) * 25.0).toInt
      (i.toLong, (0 until 20).map(j => s"tok${(i * 7 + j * 13) % vocabTop}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val g = Documents.heapsLaw(grown).collect()
    val gBeta = g.head.getLong(4) / 100.0
    assert(gBeta > 0.1 && gBeta < 1.0, s"beta=$gBeta")
    // and the fitted curve's types really grow across deciles
    assert(g.last.getLong(3) > g.head.getLong(3))
  }

  test("d29 mega-bucket divergence gauge: stream and batch agree below " +
    "the cap, diverge by exactly the mega clique above it, the " +
    "second-chance ring catches the beyond-prefix clones batch drops, " +
    "and the LRU ring survives repeat-heavy churn") {
    val s = spark
    val rows = Documents.queries("d29_megabucket_divergence")(
      s, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(rows == Seq(
      // grp, n_docs, n_truth, n_stream, n_batch, delta, s_miss, b_miss, max_bucket
      // churn (r15): clone pair split by 20 over-cap arrivals drawn
      // from only 8 distinct codes — the exact-dedup LRU ring keeps
      // the witness alive (the r14 cyclic ring evicted it after 16
      // arrivals), so the stream catches the twin AND the 12 repeated
      // fillers; the batch drop misses all 13
      ("churn", 86L, 13L, 13L, 0L, 13L, 0L, 13L, 86L),
      ("mega", 200L, 199L, 199L, 0L, 199L, 0L, 199L, 272L),
      ("paired", 60L, 30L, 30L, 30L, 0L, 0L, 0L, 7L),
      // the ring regime pins the 16-slot window's recency bound: the
      // clone's witness is evicted by 16 later over-cap arrivals
      // before its twin lands — the one dup the stream still misses
      ("ring", 82L, 1L, 0L, 0L, 0L, 1L, 1L, 82L),
      // tail before the r14 ring: n_stream 0, stream_missed 5 (the
      // poisoned prefix blinded the bucket — the shared-loss regime);
      // the ring turns all 5 clone dups into stream catches
      ("tail", 72L, 5L, 5L, 0L, 5L, 0L, 5L, 272L)), rows.toString)
  }

  test("t36 stratified sample: exactly 4 per source, the per-source " +
    "winners match a plain-Scala recompute, and the plan has no window " +
    "over the corpus") {
    val s = spark
    val df = Documents.queries("t36_stratified_sample")(s, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    // the per-group top-k must be the partial-agg Aggregator, not a
    // corpus-wide rank window (windows appear only if we regressed)
    assert(!plan.contains("Window"), plan.take(1500))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.size == 20 && bySrc.values.forall(_.length == 4))
    bySrc.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
    }
    // recompute per-source top-4 in plain Scala
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.map { case (id, src) =>
      val w = 1L << (java.lang.Integer.parseInt(md5hex(s"w:$id").substring(0, 1), 16) % 4)
      val u = java.lang.Long.parseLong(md5hex(s"u:$id").substring(0, 8), 16)
        .toDouble / 4294967296d
      val key = w match {
        case 1L => u; case 2L => math.sqrt(u); case 4L => math.sqrt(math.sqrt(u))
        case _ => math.sqrt(math.sqrt(math.sqrt(u)))
      }
      (src, id, key)
    }.groupBy(_._1).view.mapValues(
      _.sortBy(x => (-x._3, x._2)).take(4).map(_._2).toSeq).toMap
    bySrc.foreach { case (src, g) =>
      assert(g.sortBy(_._2).map(_._3).toSeq == exp(src), src)
    }
  }

  test("t37 token budget: raw count matches a Scala recompute, exact " +
    "dedup never gains tokens, span removal genuinely cuts") {
    val s = spark
    val r = Documents.queries("t37_token_budget")(s, "/root/testdata/sf0.01")
      .collect()(0)
    val (nDocs, raw, exact, span) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val docs = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").collect().filter(!_.isNullAt(0)).map(_.getString(0))
    assert(nDocs == docs.length)
    assert(raw == docs.map(_.trim.split("\\s+").length.toLong).sum)
    assert(exact <= raw && span < raw && span > 0)
    assert(r.getDouble(4) == math.round(exact.toDouble / raw * 1e6) / 1e6)
    assert(r.getDouble(5) == math.round(span.toDouble / raw * 1e6) / 1e6)
  }

  test("d27 split leakage: mixed split-pairs are ALL leaks, same-split " +
    "pairs none, and the matrix total equals the pipeline's dup pairs") {
    val s = spark
    val rows = Documents.queries("d27_split_leakage")(s, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (pair, n, leaks) =>
      val Array(a, b) = pair.split("->")
      assert(if (a == b) leaks == 0L else leaks == n, pair)
    }
    // the corpus must actually exhibit leakage (the audit's reason to exist)
    assert(rows.map(_._3).sum > 0)
    val total = rows.map(_._2).sum
    val pipelinePairs = Documents.dupPairsProbe(s, "/root/testdata/sf0.01").count()
    assert(total == pipelinePairs)
  }

  test("t34 weighted sample: keys are u^(1/w) exactly, the output is the " +
    "true top-64, heavy docs are overrepresented, and the plan is top-k") {
    val s = spark
    val df = Documents.queries("t34_weighted_sample")(s, "/root/testdata/sf0.01")
    // plan: the corpus-wide selection must be TakeOrderedAndProject,
    // never a global Sort + window over the corpus
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 64 && rows.map(_._1).toSeq == (1L to 64L))
    // recompute every doc's key in plain Scala and check the top-64 set
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = (0L until 500L).map { id =>
      val w = 1L << (java.lang.Integer.parseInt(md5hex(s"w:$id").substring(0, 1), 16) % 4)
      val u = java.lang.Long.parseLong(md5hex(s"u:$id").substring(0, 8), 16)
        .toDouble / 4294967296d
      val key = w match {
        case 1L => u; case 2L => math.sqrt(u); case 4L => math.sqrt(math.sqrt(u))
        case _ => math.sqrt(math.sqrt(math.sqrt(u)))
      }
      (id, w, key)
    }
    val expTop = all.sortBy(x => (-x._3, x._1)).take(64)
    assert(rows.map(_._2).toSeq == expTop.map(_._1))
    assert(rows.map(_._3).toSeq == expTop.map(_._2))
    rows.zip(expTop).foreach { case ((_, _, _, k), (_, _, ek)) =>
      assert(math.abs(k - ek) < 1e-9) // k is round(key, 9)
    }
    // A-ES property: selection probability rises with weight — the
    // sampled mean weight must exceed the corpus mean weight
    val corpusMean = all.map(_._2).sum.toDouble / all.size
    val sampleMean = rows.map(_._2).sum.toDouble / rows.length
    assert(sampleMean > corpusMean)
  }

  test("d26 span removal differential fuzz: random 2-letter corpora at " +
    "three window sizes match the brute force row for row") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xd26)
    def randDoc(): String = (0 until (5 + rnd.nextInt(70))).map { _ =>
      if (rnd.nextInt(4) == 0) ' ' else ('a' + rnd.nextInt(2)).toChar
    }.mkString.trim
    for (win <- Seq(4, 8, 12)) {
      val docsSeq = (0L until 40L).map(i => (i, randDoc()))
        .filter(_._2.nonEmpty)
      val all = for {
        (id, t) <- docsSeq
        p <- 1 to t.length
        if (p == 1 || t.charAt(p - 2) == ' ') && t.charAt(p - 1) != ' ' &&
          p + win <= t.length + 1
      } yield (id, p, t.substring(p - 1, p - 1 + win))
      val dup = all.groupBy(_._3).filter(_._2.size >= 2).keySet
      val expected = docsSeq.map { case (id, t) =>
        val fl = all.collect { case (i, p, w) if i == id && dup(w) => p }.sorted
        val islands = fl.foldLeft(List.empty[(Int, Int)]) { case (acc, p) =>
          acc match {
            case (s0, e0) :: rest if p <= e0 => (s0, math.max(e0, p + win)) :: rest
            case _ => (p, p + win) :: acc
          }
        }.reverse
        val cleaned = {
          val sb = new StringBuilder
          var pos = 1
          for ((s0, e0) <- islands) { sb.append(t.substring(pos - 1, s0 - 1)); pos = e0 }
          sb.append(t.substring(pos - 1)).toString
        }
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, fl.size.toLong, islands.size.toLong,
          islands.map(x => x._2 - x._1).sum.toLong, cleaned.length.toLong, md)
      }
      val got = Documents.spanRemoval(docsSeq.toDF("doc_id", "text"), win)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getString(5))).toSeq
      assert(got == expected, s"win=$win")
      // the 2-letter alphabet must actually produce dup spans
      assert(expected.map(_._4).sum > 0, s"win=$win produced no removals")
    }
  }

  test("t33 blocklist: Aho-Corasick counts = hand-derived leftmost " +
    "non-overlapping matches (fail links, shared prefixes, overlap greed)") {
    val pats = Array("fast", "fast merge", "low", "aa", "spamword")
    val ac = new graft.plans.AhoCorasick(pats)
    def counts(t: String): Seq[Long] =
      ac.counts(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .toLongArray().toSeq
    // "fast merge" fires BOTH "fast" (prefix) and "fast merge";
    // "slow" fires "low" via a fail-link output; "spamword" absent
    assert(counts("slow fast merge fast") == Seq(2L, 1L, 1L, 0L, 0L))
    // self-overlapping pattern: "aaa" has two AC matches of "aa" but
    // only ONE leftmost non-overlapping (replace semantics); "aaaa"
    // has two
    assert(counts("aaa") == Seq(0L, 0L, 0L, 1L, 0L))
    assert(counts("aaaa") == Seq(0L, 0L, 0L, 2L, 0L))
    // empty text, no matches
    assert(counts("") == Seq(0L, 0L, 0L, 0L, 0L))
    // matches butting against string ends
    assert(counts("fast") == Seq(1L, 0L, 0L, 0L, 0L))
    assert(counts("low") == Seq(0L, 0L, 1L, 0L, 0L))
  }

  test("t33 blocklist: non-ASCII patterns — CJK terms and astral-plane " +
    "emoji match as exact substrings (UTF-16 surrogate pairs intact)") {
    val pats = Array("日本語", "禁止ワード", "😀😀") // 😀😀
    val ac = new graft.plans.AhoCorasick(pats)
    def counts(t: String): Seq[Long] =
      ac.counts(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .toLongArray().toSeq
    assert(counts("これは日本語のテキストです") == Seq(1L, 0L, 0L))
    assert(counts("禁止ワードと日本語、また禁止ワード") == Seq(1L, 2L, 0L))
    // three emoji = two overlapping pairs, greedy non-overlap counts ONE
    assert(counts("x 😀😀😀 y") == Seq(0L, 0L, 1L))
    // a lone high surrogate half must not match the pair pattern
    assert(counts("x 😀 y") == Seq(0L, 0L, 0L))
    assert(counts("") == Seq(0L, 0L, 0L))
  }

  test("t33 blocklist gate: kernel column agrees with per-term contains " +
    "algebra on the real corpus, and the plan is one codegen'd scan") {
    val s = spark
    import org.apache.spark.sql.functions._
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gate = Documents.blocklistGate(d)
    // independent per-term recomputation via Spark's own replace()
    val lt = lower(col("text"))
    val alt = d.filter(col("text").isNotNull).select(col("doc_id"),
        Documents.BlocklistTerms.map(t =>
          ((length(lt) - length(regexp_replace(lt,
            java.util.regex.Pattern.quote(t), ""))) / t.length)
            .cast("long")).reduce(_ + _).as("n_hits"))
      .orderBy(col("doc_id"))
    val a = gate.select(col("doc_id"), col("n_hits")).collect().map(_.toSeq)
    val b = alt.collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // at least one doc matched something and at least one term never fires
    assert(gate.agg(sum(col("n_hits"))).collect()(0).getLong(0) > 0)
    assert(!gate.select(col("hit_terms")).collect()
      .exists(_.getString(0).contains("spamword")))
  }

  test("t38 lang dataset: split boundary mirrors the reference off-by-one " +
      "and small languages are flagged, not silently dropped") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val pad = "x" * 200
    // 'aa': 41 candidates + 1 dup + 1 short + 2 wrapper tags;
    // 'bb': 3 candidates (below a minExamples of 5)
    val rows =
      (1 to 41).map(i => (s"aa example $i $pad", "aa")) ++ Seq(
        (s"aa example 1 $pad", "aa"),   // duplicate
        ("short", "aa"),
        (s"""<doc id="9">$pad""", "aa"),
        (s"</doc>$pad", "aa")) ++
      (1 to 3).map(i => (s"bb example $i $pad", "bb"))
    val d = rows.toDF("text", "lang")
    val got = Documents.langDataset(d, minExamples = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    // aa: 45 raw docs, 43 candidates (dup counts twice pre-dedup), 41
    // examples; test_end = floor(41*0.05) = 2, val = indices 3..3 only
    // (index 2 falls to TRAIN — the reference's `test_end < i` quirk)
    assert(got.toSeq == Seq(
      ("aa", 45L, 42L, 41L, 2L, 1L, 38L, true),
      ("bb", 3L, 3L, 3L, 0L, 0L, 3L, false)), got.toSeq)
  }
}
