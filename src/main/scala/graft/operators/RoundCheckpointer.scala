package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Eagerly localCheckpoints each round of an iterative operator,
  * releasing the blocks of the superseded previous round right away
  * instead of leaving them for the ContextCleaner: over many rounds (or
  * many queries in one driver) un-released checkpoint blocks pile up in
  * the block manager until a driver GC happens to run — measured as
  * multi-second GC noise billed to whatever query runs next. Checkpoint
  * ids are identified by diffing the persistent-RDD registry around the
  * (eager) checkpoint, which assumes rounds run sequentially within
  * this driver — true for the operators here; concurrent jobs would
  * only make the release a no-op for a foreign id, never an early
  * unpersist, because `supersededIds` holds ids this loop created
  * itself.
  */
private[graft] final class RoundCheckpointer(spark: SparkSession) {
  private val sc = spark.sparkContext
  private var liveIds: Set[Int] = Set.empty
  private var supersededIds: Set[Int] = Set.empty

  def next(df: DataFrame): DataFrame = {
    val pre = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint()
    supersededIds ++= liveIds
    // Only checkpoint-MARKED rdds may enter liveIds: a caller's lazy
    // persist() (the input edges, the LSH stages) often materializes —
    // and registers — during this very checkpoint job, so a bare
    // registry diff would capture those foreign cache rdds and a later
    // releaseSuperseded() would silently unpersist them, forcing every
    // subsequent round to recompute the full upstream lineage (found
    // as d15 re-running the whole LSH pipeline on 9 of its 10 rounds).
    // Cache rdds are never checkpointed; the localCheckpoint rdd is.
    liveIds = (sc.getPersistentRDDs -- pre)
      .collect { case (id, rdd) if rdd.isCheckpointed => id }.toSet
    ck
  }

  /** Drop the blocks of rounds superseded by a later [[next]] call.
    * Callers invoke this only once the superseded round's DataFrame
    * is no longer referenced by any in-flight job — a localCheckpoint
    * cannot be recomputed once its blocks are gone.
    */
  def releaseSuperseded(): Unit = {
    supersededIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    supersededIds = Set.empty
  }
}
