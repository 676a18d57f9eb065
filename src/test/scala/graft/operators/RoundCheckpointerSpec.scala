package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 nextLazy fix (r17 ADVICE, medium): the registry diff
  * around the LAZY checkpoint marking must capture only checkpoint-
  * marked RDDs. Dataset.localCheckpoint(eager = false) still constructs
  * the physical plan, which is where a caller's un-materialized
  * .persist() registers its cache RDD (and with AQE on, shuffle
  * query-stage jobs can run right there) — a bare diff put that foreign
  * cache into liveIds and the next releaseSuperseded() silently
  * unpersisted it, re-running the supposedly loop-invariant work every
  * round (minLabelPropagate's pre-partitioned edge cache was the real
  * instance).
  */
class RoundCheckpointerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("round-checkpointer-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("releaseSuperseded never unpersists a foreign cache that " +
    "registered during nextLazy's plan construction") {
    val sc = spark.sparkContext
    val ckpt = new RoundCheckpointer(spark)
    // lazy persist, NOT materialized before nextLazy: its cache RDD
    // registers during the checkpoint marking's physical planning —
    // exactly minLabelPropagate's pre-partitioned edges shape
    val foreign = spark.range(200).toDF("v")
      .repartition(2, col("v")).persist()
    val pre = sc.getPersistentRDDs.keySet
    val r0 = ckpt.nextLazy(
      foreign.groupBy((col("v") % 7).as("g")).agg(count(lit(1)).as("n")))
    // precondition: the hazard shape reproduces — at least one NON-
    // checkpoint-marked RDD (the foreign cache) registered during the
    // nextLazy call, alongside the checkpoint-marked one
    val registered = sc.getPersistentRDDs.view
      .filterKeys(!pre.contains(_)).toMap
    val foreignIds = registered.collect {
      case (id, rdd)
        if !org.apache.spark.rdd.RddMarks.isLocallyCheckpointed(rdd) &&
          !rdd.isCheckpointed => id
    }.toSet
    assert(foreignIds.nonEmpty,
      "test shape no longer registers the foreign cache inside nextLazy " +
        "— rebuild the shape so the guard stays exercised")
    r0.count() // materialize round 0 (the nextLazy contract)
    val r1 = ckpt.nextLazy(r0.select(col("g"), col("n")))
    r1.count()
    ckpt.releaseSuperseded() // drops r0's blocks — must NOT touch foreign
    val after = sc.getPersistentRDDs.keySet
    assert(foreignIds.subsetOf(after),
      s"releaseSuperseded unpersisted foreign cache rdds ${foreignIds.diff(after)}")
    foreign.unpersist(blocking = false)
    ckpt.releaseAll()
  }
}
