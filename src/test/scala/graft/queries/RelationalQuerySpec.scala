package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Topology-level properties of the relational pack's non-trivial
  * rewrites: the bucketed interval self-join (q15) must enumerate
  * exactly the pairs the naive non-equi join defines.
  */
class RelationalQuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("relational-query-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q15 bucketed co-occurrence join equals the naive non-equi join") {
    val s = spark
    import s.implicits._
    val bin = 100L
    // adversarial layout: pairs exactly AT the window bound (Δ=bin),
    // one past it (Δ=bin+1), equal timestamps (id tiebreak), bin-edge
    // straddles, and a second user that must never pair with the first
    val ev = Seq(
      (1L, 10L, "a", 0L), (2L, 10L, "b", 100L), (3L, 10L, "c", 101L),
      (4L, 10L, "d", 199L), (5L, 10L, "e", 200L), (6L, 10L, "f", 200L),
      (7L, 20L, "g", 150L), (8L, 20L, "h", 250L), (9L, 20L, "i", 351L),
    ).toDF("event_id", "user_id", "event_type", "us")

    val bucketed = Relational.cooccurPairs(ev, bin)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val a = ev.select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"))
    val b = ev.select(col("user_id"), col("event_id").as("b_id"), col("us").as("b_us"))
    val naive = a.join(b, Seq("user_id"))
      .filter((col("b_us") > col("a_us") ||
               (col("b_us") === col("a_us") && col("b_id") > col("a_id"))) &&
              col("b_us") - col("a_us") <= bin)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    assert(bucketed == naive)
    // spot-pin the boundary semantics: Δ=bin pairs in, Δ=bin+1 stays out,
    // equal-ts pairs once (smaller id first)
    assert(bucketed.contains((1L, 2L)) && !bucketed.contains((1L, 3L)))
    assert(bucketed.contains((5L, 6L)) && !bucketed.contains((6L, 5L)))
    assert(bucketed.contains((7L, 8L)) && !bucketed.contains((8L, 9L)))
  }

  test("nfc_normalize: codegen'd expression composes and passes through") {
    val s = spark
    import s.implicits._
    import graft.functions.TextAnalysis
    val rows = Seq(
      "cafe\u0301 au lait", // decomposed e + combining acute
      "caf\u00e9 au lait",  // already composed (the isNormalized fast path)
      "plain ascii",
      "a\u0301\u0301",     // stacked combining marks: first composes, second stays
    ).toDF("text")
      .select(col("text"), TextAnalysis.nfcNormalize(col("text")).as("norm"))
      .collect()
    assert(rows(0).getString(1) == "caf\u00e9 au lait")
    assert(rows(1).getString(1) == "caf\u00e9 au lait")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "\u00e1\u0301")
    // nulls propagate
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextAnalysis.nfcNormalize(col("text"))).head
    assert(n.isNullAt(0))
  }
  test("q20 Count-Min: never undercounts, and the full top-10 matches a " +
    "plain-Scala sketch recomputation") {
    val s = spark
    val got = Relational.queries("q20_cm_heavy_hitters")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.reverse.toSeq)
    // recompute the whole sketch in plain Scala
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def cells(k: String): Seq[(Int, Long)] = (0 until 4).map(i =>
      i -> java.lang.Long.parseLong(md5hex(s"$i:$k").substring(0, 8), 16) % 64)
    val keys = s.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id").collect().map(_.getLong(0).toString)
    val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val counters = keys.flatMap(cells).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val est = exact.map { case (k, ex) =>
      (k, ex, cells(k).map(counters).min) }
    val expTop = est.toSeq.sortBy(x => (-x._3, x._1)).take(10)
      .map(x => (x._1, x._2, x._3, x._3 - x._2))
    assert(got.toSeq == expTop)
  }

  test("q19 funnel differential fuzz: 120 random event streams match a " +
    "brute-force state machine, including same-timestamp pileups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x19f)
    val types = Array("view", "click", "purchase", "error", "signup")
    val events = for {
      u <- 0L until 120L
      n = 1 + rnd.nextInt(12)
      i <- 0 until n
    } yield (u,
      // coarse seconds force frequent same-timestamp collisions, so the
      // event_id tiebreak is genuinely exercised
      new java.sql.Timestamp(1700000000000L + rnd.nextInt(5) * 1000L),
      u * 1000L + i, types(rnd.nextInt(types.length)))
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._3))
      val stage = ordered.foldLeft(0) { (st, e) =>
        (st, e._4) match {
          case (0, "view") => 1
          case (1, "click") => 2
          case (2, "purchase") => 3
          case _ => st
        }
      }
      u -> stage
    }
    val got = Relational.funnelStages(
        events.toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
    // the random corpus must actually exercise every stage
    assert(expected.values.toSet == Set(0, 1, 2, 3))
  }

  test("q21 retention: offset-0 is 1.0 by construction, actives never " +
    "exceed the cohort, and the triangle is complete") {
    val s = spark
    val rows = Relational.queries("q21_retention")(s, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length >= 2,
      "needs a multi-cohort triangle to be meaningful")
    rows.filter(_._2 == 0L).foreach { case (_, _, nc, na, r) =>
      assert(na == nc && r == 1.0)
    }
    rows.foreach { case (_, off, nc, na, r) =>
      assert(off >= 0 && na <= nc && r == math.round(na.toDouble / nc * 1e6) / 1e6)
    }
    // every cohort has an offset-0 row
    val cohorts = rows.map(_._1).distinct
    assert(cohorts.forall(c => rows.exists(x => x._1 == c && x._2 == 0L)))
  }

  test("q19 funnel: strict-sequence state machine on crafted users") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // u1: full funnel in order; u2: click BEFORE the first view must not
    // count (re-click after the view does); u3: purchase before click
    // never counts -> stuck at stage 2; u4: no view at all -> stage 0;
    // u5: view only -> stage 1
    val ev = Seq(
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "click"), (1L, t(3), 3L, "purchase"),
      (2L, t(1), 10L, "click"), (2L, t(2), 11L, "view"), (2L, t(3), 12L, "click"),
      (2L, t(4), 13L, "purchase"),
      (3L, t(1), 20L, "view"), (3L, t(2), 21L, "purchase"), (3L, t(3), 22L, "click"),
      (4L, t(1), 30L, "click"), (4L, t(2), 31L, "purchase"),
      (5L, t(1), 40L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val stages = Relational.funnelStages(ev).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages == Map(1L -> 3, 2L -> 3, 3L -> 2, 4L -> 0, 5L -> 1))
    val sum = Relational.funnelSummary(ev).collect()(0)
    assert((sum.getLong(0), sum.getLong(1), sum.getLong(2), sum.getLong(3)) ==
      ((5L, 4L, 3L, 2L)))
    // tie at identical ts resolves by event_id: view(e=1) then click(e=2)
    // at the SAME instant still progresses
    val tie = Seq((9L, t(1), 1L, "view"), (9L, t(1), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(Relational.funnelStages(tie).collect()(0).getInt(1) == 2)
  }
}
