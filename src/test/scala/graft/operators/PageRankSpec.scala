package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("pagerank-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ranksOf(pairs: Seq[(Long, Long)], iters: Int = 10): Map[Long, Double] = {
    val s = spark
    import s.implicits._
    PageRank.undirected(pairs.toDF("doc_a", "doc_b"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Reference power iteration with the same per-round 9-dp rounding. */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toDouble }
    var ranks = deg.map { case (k, _) => k -> 1.0 }
    for (_ <- 1 to iters) {
      val contribs = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => ranks(u) / deg(u) }.sum
      }
      ranks = deg.map { case (k, _) =>
        k -> BigDecimal(0.15 + 0.85 * contribs.getOrElse(k, 0.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    ranks
  }

  test("path graph: the middle vertex out-ranks the ends; symmetry holds") {
    val ranks = ranksOf(Seq((1L, 2L), (2L, 3L)))
    assert(ranks(2L) > ranks(1L))
    assert(ranks(1L) == ranks(3L)) // symmetric positions, identical rank
  }

  test("matches a driver-side reference implementation on a mixed graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (10L, 11L))
    val got = ranksOf(edges, iters = 7)
    val want = naive(edges, iters = 7)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-8, s"vertex $k") }
    // the isolated pair's vertices converge to rank 1 (deg 1 both sides)
    assert(math.abs(got(10L) - 1.0) < 1e-6)
  }

  test("leaves no lingering cached blocks behind") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.size
    PageRank.undirected(Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")).count()
    // only the final round's checkpoint may remain
    assert(s.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("r17 pre-partitioned rounds (big-graph path) match the 1-partition path") {
    // 150k edges with bounded degree: RoundPartitions keeps >= 2 round
    // partitions, so the size-gated invariant pre-partition ENGAGES; a
    // second run under a 1-partition session forces the gate OFF. Both
    // must reach the identical ranks (per-round 9-dp rounding is the
    // engine's cross-partitioning determinism contract).
    val s = spark
    import s.implicits._
    val edges = (0L until 150000L).map(i => (i, i + 1 + (i % 7))).toDF("doc_a", "doc_b")
    val gated = PageRank.undirected(edges, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "1")
    try {
      val flat = PageRank.undirected(edges, iterations = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(gated.size == flat.size)
      assert(gated == flat)
    } finally s.conf.set(key, prev)
    // and no cached blocks leaked from the pre-partitioned invariant
    assert(s.sparkContext.getPersistentRDDs.values
      .forall(r => !r.toString.contains("Repartition")))
  }
}
