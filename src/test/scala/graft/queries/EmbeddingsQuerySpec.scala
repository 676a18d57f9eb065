package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Similarity._

/** Pins the e08 building blocks: the compiled SRP band-key kernel must
  * agree bit-for-bit with the Catalyst HOF rendition ([[srpBucket]]) it
  * mirrors — band 0 of `srpBandKeys(1, k)` uses global plane indices
  * 0..k-1, which is exactly `srpBucket(v, k)`'s plane family.
  */
class EmbeddingsQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("embeddings-spec")
    .getOrCreate()

  test("e09 PQ: seed vectors encode to themselves when alone in a cell") {
    val out = Embeddings.queries("e09_product_quantize")(spark, "/root/testdata/sf0.001")
      .collect()
    // shape: 8 codes per vector, codes within [0, 16)
    val n = out.map(_.getLong(0)).distinct.length
    assert(out.length == n * 8)
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(2) < 16L))
    // every vector's error is the distance to its NEAREST refined code,
    // so per-subspace error of a seed vector <= distance to the cell it
    // trained (sanity: errs are finite, non-negative)
    assert(out.forall(_.getDouble(3) >= 0.0))
    // determinism: a second evaluation returns the identical encoding
    val again = Embeddings.queries("e09_product_quantize")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("e10 k-means: partitions the corpus, deterministic across evaluations") {
    val out = Embeddings.queries("e10_kmeans")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 8) // all 8 clusters survive on this corpus
    val total = out.map(_.getLong(1)).sum
    assert(total == 500L) // every vector assigned exactly once
    assert(out.forall(_.getDouble(2) > 0.0)) // inertia positive
    val again = Embeddings.queries("e10_kmeans")(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("e11 semdedup finds exactly the injected near-dup pairs, each in-cluster") {
    val out = Embeddings.queries("e11_semdedup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // each perturbed copy (vec_id + 100000) pairs with its original and
    // nothing else: random 64-dim vectors never reach cosine 0.95
    assert(out.length == 10)
    out.foreach { case (a, b, cos) =>
      assert(b == a + 100000L, s"unexpected pair ($a, $b)")
      assert(cos > 0.99)
    }
  }

  test("e12 ann recall: one row per query vector, recall = hits/exact in [0,1]") {
    val out = Embeddings.queries("e12_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    out.foreach { r =>
      val (nExact, nHits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nExact == 3L && nHits >= 0L && nHits <= 3L)
      assert(math.abs(recall - nHits.toDouble / nExact) < 1e-3)
    }
  }

  test("e20 binary rerank: recall is monotone in over-fetch depth and " +
      "the 64-deep rerank beats raw binary top-3 (e19)") {
    def avg(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    val curve = Embeddings.queries("e20_binary_rerank_recall")(
        spark, "/root/testdata/sf0.001").collect()
    val at16 = curve.filter(_.getAs[Long]("overfetch") == 16L)
    val at64 = curve.filter(_.getAs[Long]("overfetch") == 64L)
    assert(at16.length == 5 && at64.length == 5)
    // deeper over-fetch can only add candidates: per-query recall@64 >=
    // recall@16 (set containment, not just on average)
    at16.zip(at64).foreach { case (a, b) =>
      assert(a.getAs[Long]("q_vec_id") == b.getAs[Long]("q_vec_id"))
      assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall") - 1e-9)
    }
    val raw = avg(Embeddings.queries("e19_binary_quantize_recall")(
      spark, "/root/testdata/sf0.001").collect())
    assert(avg(at64) > raw,
      s"64-deep rerank ${avg(at64)} should beat raw binary top-3 $raw")
  }

  test("e13: k-means-trained IVF cells beat label cells on recall@3") {
    def avgRecall(q: String): Double = {
      val rows = Embeddings.queries(q)(spark, "/root/testdata/sf0.001").collect()
      rows.map(_.getDouble(3)).sum / rows.length
    }
    val labelCells = avgRecall("e12_ann_recall")
    val trainedCells = avgRecall("e13_kmeans_ivf_recall")
    // random vectors vs label partitions: near-random recall; trained
    // cells cluster cosine-near vectors so probed search works
    assert(trainedCells > labelCells + 0.3,
      s"trained $trainedCells should clearly beat label $labelCells")
    assert(trainedCells > 0.8)
  }

  test("e22 probe curve: recall is monotone in probe count and matches " +
      "e13 at probes = 2") {
    val curve = Embeddings.queries("e22_ivf_probe_curve")(
      spark, "/root/testdata/sf0.001").collect()
      .groupBy(_.getAs[Long]("probes"))
      .view.mapValues(rs => rs.map(r =>
        r.getAs[Long]("q_vec_id") -> r.getAs[Double]("recall")).toMap).toMap
    assert(curve.keySet == Set(1L, 2L, 4L))
    // more probes can only ADD candidates: per-query monotone recall
    curve(1L).keys.foreach { q =>
      assert(curve(2L)(q) >= curve(1L)(q) - 1e-9)
      assert(curve(4L)(q) >= curve(2L)(q) - 1e-9)
    }
    // probes = 2 IS e13's configuration — the curve point must equal it
    val e13 = Embeddings.queries("e13_kmeans_ivf_recall")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("q_vec_id") -> r.getAs[Double]("recall")).toMap
    assert(curve(2L) == e13)
  }

  test("e21 ivfpq: candidates restricted to probed cells, ADC ranks them, " +
      "recall bounded by the e12 cell ceiling") {
    val out = Embeddings.queries("e21_ivfpq_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (nExact, nHits, recall) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nExact === 3)
      assert(nHits >= 0 && nHits <= nExact)
      assert(math.abs(recall - nHits.toDouble / nExact) < 1e-3)
    }
    // the coarse stage is e12's label cells (cosine probe) while the
    // truth here is L2, so IVFPQ recall can only lose vs scoring the
    // probed cells exactly — it must never exceed 1.0 and the PQ stage
    // must still return a full top-3 per query (ADC always ranks the
    // whole probed candidate set, never fewer than k)
    out.foreach(r => assert(r.getDouble(3) <= 1.0))
  }

  test("srpBandKeys band 0 == srpBucket (kernel vs HOF parity)") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      Seq(0.3, -0.2, 0.7, -0.4, 0.1, 0.05, -0.9, 0.66),
      Seq(-1.0, 2.0, -3.0, 4.0, -5.0, 6.0, -7.0, 8.0),
      Seq(0.001, 0.002, -0.003, 0.004, -0.005, 0.006, -0.007, 0.008),
    ).toDF("v")
    val got = vecs.select(
      element_at(srpBandKeys(bands = 1, rows = 8)(col("v")), 1).as("kernel"),
      srpBucket(col("v"), 8).as("hof")).collect()
    got.foreach { r => assert(r.getLong(0) === r.getLong(1), r.toString) }
  }

  test("srpBandKeys emits `bands` keys, each within rows bits") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq.tabulate(64)(d => math.sin(d + 1))).toDF("v")
    val keys = df.select(srpBandKeys(bands = 4, rows = 16)(col("v")).as("k"))
      .collect()(0).getSeq[Long](0)
    assert(keys.length === 4)
    keys.foreach(k => assert(k >= 0L && k < (1L << 16)))
  }

  test("e08 at cluster scale reuses the bands exchange (SRP kernel runs once)") {
    // bands feed three consumers; under sort-merge joins (the 100 TB
    // regime — force it by disabling broadcast) all three hang off the
    // same (band_id, bkey) shuffle and AQE must dedup it into
    // ReusedExchange reads instead of recomputing the kernel subtree
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Embeddings.queries("e08_embedding_neardup")(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert("ReusedExchange".r.findAllIn(plan).nonEmpty, plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("e08 finds exactly the injected perturbed near-dups at sf0.001") {
    val rows = Embeddings.queries("e08_embedding_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 100000L)
      assert(r.getDouble(2) >= 0.99)
    }
  }

  test("e24 filtered ANN: post-filter recall recovers with probe count " +
    "and the truth set respects the predicate") {
    val rows = Embeddings.queries("e24_filtered_ann")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(4), r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet == Set(2L, 4L))
    // per query, more probes never lose hits (same ranked pass, wider cut)
    byProbe(2L).foreach { case (_, q, _, hits2, _) =>
      val hits4 = byProbe(4L).find(_._2 == q).get._4
      assert(hits4 >= hits2)
    }
    // the collapse is real on this corpus: probes=2 must be imperfect,
    // probes=4 must strictly improve the total
    assert(byProbe(2L).map(_._4).sum < byProbe(2L).map(_._3).sum)
    assert(byProbe(4L).map(_._4).sum > byProbe(2L).map(_._4).sum)
  }

  test("e23 multi-probe LSH: recall and candidate volume are monotone in " +
    "the probe radius, and probing never misses what probe-0 found") {
    val rows = Embeddings.queries("e23_multiprobe_lsh")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // candidates strictly grow with radius (each ball strictly contains
    // the smaller one on this corpus), recall never drops
    assert(rows(0)._2 < rows(1)._2 && rows(1)._2 < rows(2)._2)
    assert(rows(0)._3 <= rows(1)._3 && rows(1)._3 <= rows(2)._3)
    rows.foreach { case (_, n, found, recall) =>
      assert(found <= 10 && recall == found / 10.0 && n >= found)
    }
    // the harder perturbation makes probe-0 genuinely lossy and the
    // widest probe complete — the curve this gauge exists to show
    assert(rows(0)._3 < 10L && rows(2)._3 == 10L)
  }

  test("r17 compiled vector kernels are bit-identical to the HOF forms " +
    "(dot/norm/cosine/sqdist), incl. null and length-mismatch semantics") {
    import spark.implicits._
    // adversarial values: denormals, huge magnitudes, negative zero —
    // any reordering or fused-multiply drift would show here
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map { i =>
      val n = if (i % 7 == 0) 8 else 64
      (Seq.fill(n)(rnd.nextDouble() * math.pow(10, rnd.nextInt(9) - 4) *
        (if (rnd.nextBoolean()) 1 else -1)),
       Seq.fill(n)(rnd.nextDouble() * math.pow(10, rnd.nextInt(9) - 4) *
        (if (rnd.nextBoolean()) 1 else -1)))
    } :+ ((Seq(0.0, -0.0, 1e-300), Seq(-0.0, 0.0, 1e300)))
    val df = vecs.toDF("a", "b")
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)
    val rows = df.select(
      dot(col("a"), col("b")).as("k_dot"), hofDot(col("a"), col("b")).as("h_dot"),
      norm(col("a")).as("k_na"), sqrt(hofDot(col("a"), col("a"))).as("h_na"),
      cosine(col("a"), col("b")).as("k_cos"),
      (hofDot(col("a"), col("b")) /
        (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b"))))).as("h_cos"),
      Embeddings.sqDistCol(col("a"), col("b")).as("k_sq"),
      hofSq(col("a"), col("b")).as("h_sq")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"norm: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)), s"cosine: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(6)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(7)), s"sqdist: $r")
    }
    // null / length-mismatch: both forms must agree on null-ness
    val edge = Seq((Seq(1.0, 2.0), null: Seq[Double]),
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = edge.select(dot(col("a"), col("b")), hofDot(col("a"), col("b")),
      cosine(col("a"), col("b"))).collect()
    e.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)) }
  }

  test("r17 row-local argmin assignment == crossJoin+groupBy min(struct) " +
    "(the r16 kmeansAssign/pqEncode shape) on the real corpus") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)
    // the r16 shape, verbatim
    val old = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"),
        struct(hofSq(col("v"), col("cv")).as("d"), col("cid").as("c")).as("dc"))
      .groupBy(col("vec_id"), col("v"))
      .agg(min(col("dc")).as("best"))
      .select(col("vec_id"), col("best.c").as("cid"), col("best.d").as("d"))
    val neu = Embeddings.kmeansAssign(emb, cents)
      .select(col("vec_id"), col("cid"), col("d"))
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
  }

  test("r18 argmin NaN ordering (ADVICE r17): a NaN-distance book entry " +
    "loses to any finite one regardless of book order, matching " +
    "min(struct)'s nanSafeCompareDoubles") {
    import spark.implicits._
    val emb = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, -1.0)))
      .toDF("vec_id", "v")
    // cid 0 carries a NaN component -> NaN distance to everything; it
    // must NEVER win while a finite centroid exists. collect_list order
    // is nondeterministic, so drive both orders explicitly.
    val nanFirst = Seq((0, Seq(Double.NaN, 0.0)), (1, Seq(0.0, 0.0)))
      .toDF("cid", "cv")
    val nanLast = Seq((1, Seq(0.0, 0.0)), (0, Seq(Double.NaN, 0.0)))
      .toDF("cid", "cv")
    for (cents <- Seq(nanFirst, nanLast)) {
      val got = Embeddings.kmeansAssign(emb, cents)
        .select(col("vec_id"), col("cid")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(0L -> 1, 1L -> 1), s"NaN entry won: $got")
    }
    // the old min(struct(d, c)) agrees on NaN ranking (reference run)
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)
    val old = emb.crossJoin(broadcast(nanFirst))
      .select(col("vec_id"),
        struct(hofSq(col("v"), col("cv")).as("d"), col("cid").as("c")).as("dc"))
      .groupBy(col("vec_id")).agg(min(col("dc")).as("best"))
      .select(col("vec_id"), col("best.c")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(old == Map(0L -> 1, 1L -> 1))
    // all-NaN book: ties resolve to the smallest cid, like struct order
    val allNaN = Seq((7, Seq(Double.NaN, 0.0)), (3, Seq(Double.NaN, 1.0)))
      .toDF("cid", "cv")
    val gotAll = Embeddings.kmeansAssign(emb, allNaN)
      .select(col("vec_id"), col("cid")).collect().map(_.getInt(1)).toSet
    assert(gotAll == Set(3))
  }

  test("r18 null-element contract (ADVICE r17): the embeddings corpus " +
    "carries no null vector elements at either verified SF — the " +
    "compiled kernels' stated precondition") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val bad = graft.Tables.embeddings(spark, s"/root/testdata/$sf")
        .filter(expr("exists(embedding, x -> x IS NULL)")).count()
      assert(bad == 0L, s"$sf: $bad rows with null elements")
    }
  }
}
