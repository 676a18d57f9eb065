package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

/** Exactly-once micro-batch sinks for at-least-once batch delivery —
  * the Spark analog of the reference's Beam `finish_bundle` +
  * deterministic-id contract (resiliparse-py/resiliparse/beam/
  * elasticsearch.py:173-227): Structured Streaming guarantees each
  * micro-batch is delivered to `foreachBatch` AT LEAST once (a crash
  * between sink write and checkpoint commit replays the batch on
  * restart), so the sink must make replays idempotent to get
  * exactly-once OUTPUT.
  */
object ExactlyOnce {

  /** Idempotent WARC micro-batch writer for
    * `df.writeStream.foreachBatch(ExactlyOnce.warcBatchWriter(out))`:
    * each batch lands in `out/batch-<batchId>` with overwrite semantics,
    * so a replayed batch REPLACES its own previous (possibly partial)
    * output instead of appending a duplicate — the directory's content
    * is exactly-once for any number of replays. Re-scan the result with
    * `spark.read.format("warc").load(s"$out/batch-*")`.
    *
    * `coalesceTo` bounds files per batch (1 = the one-archive-per-drop
    * layout); at scale leave it higher so the write stays parallel.
    */
  def warcBatchWriter(out: String, options: Map[String, String] = Map.empty,
      coalesceTo: Int = 1): (Dataset[Row], Long) => Unit = (batch, batchId) => {
    var w = batch.coalesce(coalesceTo).write.format("warc").mode("overwrite")
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.save(s"$out/batch-$batchId")
  }
}
