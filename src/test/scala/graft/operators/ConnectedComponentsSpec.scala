package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two connected-component algorithms must agree on every graph —
  * min-label propagation (rounds = diameter) and the alternating
  * large-star/small-star contraction (rounds = O(log diameter), the
  * planetary-scale path).
  */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("cc-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairsDF(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("minLabelPropagate clusters a chain a~b~c (a!~c) to the min id, capped rounds") {
    // a path graph 1-2-3-4-5 plus a separate pair 10-11: diameter 4, so
    // the fixpoint must propagate label 1 across the whole chain even
    // though no single edge connects 1 to 5
    val pairs = pairsDF(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
    val labels = labelsOf(ConnectedComponents.minLabelPropagate(pairs))
    assert((1L to 5L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    // the round cap guards pathological diameters: capped at 1 round the
    // far end of the chain cannot yet have the global min label
    val capped = labelsOf(ConnectedComponents.minLabelPropagate(pairs, maxRounds = 1))
    assert(capped(5L) == 3L) // one round: 5 saw 4's round-0 label (3), not 1
  }

  test("largeStarSmallStar agrees with minLabelPropagate on a mixed random graph") {
    // deterministic pseudo-random graph: 60 vertices, multiplicative
    // shifts — yields several components of varying shape
    val pairs = (0L until 60L).flatMap { i =>
      val a = (i * 7 + 3) % 60
      val b = (i * 13 + 5) % 60
      Seq(if (i != a) Some((i, a)) else None,
          if (i % 3 == 0 && i != b) Some((i, b)) else None).flatten
    }
    val df = pairsDF(pairs)
    val viaStars = labelsOf(ConnectedComponents.largeStarSmallStar(df))
    val viaLabels = labelsOf(ConnectedComponents.minLabelPropagate(df, maxRounds = 100))
    assert(viaStars == viaLabels)
    // every label is a component member and the component's minimum
    assert(viaStars.values.toSet.subsetOf(viaStars.keySet))
    viaStars.foreach { case (id, lbl) => assert(lbl <= id) }
  }

  test("largeStarSmallStar converges on a 64-node path within O(log d) rounds") {
    // a 64-node path has diameter 63: label propagation capped at 10
    // rounds CANNOT finish, the star contraction must (log2 63 < 10) —
    // this is precisely why it is the at-scale algorithm
    val path = pairsDF((1L until 64L).map(i => (i, i + 1)))
    val viaStars = labelsOf(ConnectedComponents.largeStarSmallStar(path, maxRounds = 10))
    assert(viaStars.size == 64 && viaStars.values.forall(_ == 1L))
    val capped = labelsOf(ConnectedComponents.minLabelPropagate(path, maxRounds = 10))
    assert(capped.values.exists(_ != 1L)) // propagation is still mid-flight
  }

  test("round checkpoints never release a caller's cache") {
    // the input is persisted but LAZY: it materializes (and registers in
    // getPersistentRDDs) inside round-0's eager checkpoint job — a bare
    // registry diff would adopt it and a later round would unpersist it,
    // silently forcing full upstream recompute every subsequent round
    val pairs = pairsDF(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))).persist()
    try {
      ConnectedComponents.minLabelPropagate(pairs).collect()
      val nonCheckpointCaches = spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
      assert(nonCheckpointCaches.nonEmpty,
        "the caller's persisted input must survive the rounds")
    } finally pairs.unpersist(blocking = true)
  }

  test("property: both algorithms agree with a union-find reference on random graphs") {
    // scalacheck-driven: 25 random graphs of varied density; ground
    // truth from a driver-side union-find
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      verts.map(v => v -> find(v)).toMap
    }
    val genGraph = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
      if edges.nonEmpty
    } yield (n, edges)
    val prop = Prop.forAllNoShrink(genGraph) { case (n, edges) =>
      val df = pairsDF(edges)
      val want = unionFind(n, edges)
      val viaStars = labelsOf(ConnectedComponents.largeStarSmallStar(df))
      val viaProp = labelsOf(ConnectedComponents.minLabelPropagate(df))
      viaStars == want && viaProp == want
    }
    val result = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("largeStarSmallStar handles empty input and a single pair") {
    assert(ConnectedComponents.largeStarSmallStar(pairsDF(Seq.empty)).isEmpty)
    val one = labelsOf(ConnectedComponents.largeStarSmallStar(pairsDF(Seq((7L, 4L)))))
    assert(one == Map(7L -> 4L, 4L -> 4L))
  }

  test("r17 pre-partitioned min-label rounds (big-graph path) reach the exact fixpoint") {
    // 150k edges in 1,000 hub components (diameter 2): big enough that
    // RoundPartitions keeps >= 2 round partitions, so the size-gated
    // invariant pre-partition ENGAGES. Labels are integer mins — the
    // fixpoint is exact regardless of partitioning, so this pins the
    // gated path's correctness outright (hub id = component min).
    val pairs = pairsDF((1000L until 150000L).map(i => (i, i % 1000L)))
    val labels = labelsOf(ConnectedComponents.minLabelPropagate(pairs))
    assert(labels.size == 150000)
    assert((1000L until 150000L).forall(i => labels(i) == i % 1000L))
    assert((0L until 1000L).forall(h => labels(h) == h))
  }
}
