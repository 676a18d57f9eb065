package org.apache.spark.rdd

/** Bridge to RDD's private[spark] checkpoint-mark accessor (same
  * extension-library pattern as sql.GraftColumnBridge): the r18
  * RoundCheckpointer fix must distinguish a LAZILY checkpoint-MARKED
  * rdd (isLocallyCheckpointed is true at the mark, before any
  * materialization) from a foreign cache rdd that registered during
  * the same plan construction — `isCheckpointed` alone stays false
  * until the lazy checkpoint materializes.
  */
object RddMarks {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
