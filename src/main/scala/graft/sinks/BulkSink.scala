package graft.sinks

import scala.collection.mutable

/** Buffered, retrying bulk sink — the reference's Elasticsearch indexing
  * policy made pluggable (resiliparse-py/resiliparse/beam/elasticsearch
  * .py:36-227): buffer N actions, sort the buffer by id for stable retry
  * order, flush in chunks, retry failed items with exponential backoff,
  * optionally skip client errors. The external service is behind
  * [[BulkBackend]] so the policy is testable offline; [[JsonLinesBackend]]
  * is the default shipping target in this environment.
  *
  * Use from Spark as `df.foreachPartition(BulkSink.writer(...))` (batch)
  * or inside a `ForeachWriter` (streaming) — one sink instance per
  * partition, flush on close (the Beam finish_bundle analog).
  */
trait BulkBackend {
  /** Attempt a chunk; return ids that FAILED retryably. Throw only for
    * fatal errors.
    */
  def bulkIndex(chunk: Seq[(String, String)]): Seq[String]

  /** Index-bootstrap hook (the reference's `ensure_index`,
    * beam/elasticsearch.py:281-303): create `index` with the given
    * settings/mappings if it does not exist, and do nothing if it does.
    * Losing a concurrent-creation race (the ES "400
    * resource_already_exists" case) MUST be tolerated as success —
    * many partitions bootstrap the same index at once. The file-backed
    * backends realize this as an atomically-created `_index-<name>.json`
    * metadata sidecar; a real ES backend maps it to indices.exists /
    * indices.create.
    */
  def ensureIndex(index: String, settings: Map[String, String] = Map.empty,
      mappings: String = "{}"): Unit = ()
  def close(): Unit = ()
}

private[sinks] object BulkBackend {
  /** Serialize the ensure_index metadata body (settings + mappings),
    * matching the reference's create body shape.
    */
  def indexMetaJson(settings: Map[String, String], mappings: String): String = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val st = settings.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    s"""{"settings":$st,"mappings":$mappings}"""
  }
}

/** Rejects every item on the FIRST bulk attempt (retryably, writing
  * nothing), then delegates — the deterministic flaky service used to
  * exercise the retry/backoff path end to end.
  */
final class FirstAttemptFlaky(inner: BulkBackend) extends BulkBackend {
  private var first = true
  override def bulkIndex(chunk: Seq[(String, String)]): Seq[String] =
    if (first) { first = false; chunk.map(_._1) }
    else inner.bulkIndex(chunk)
  override def close(): Unit = inner.close()
}

/** Appends `id \t json` lines to a local file — the offline default. */
final class JsonLinesBackend(path: String) extends BulkBackend {
  private val out = new java.io.PrintWriter(
    new java.io.BufferedWriter(new java.io.FileWriter(path, true)))
  override def bulkIndex(chunk: Seq[(String, String)]): Seq[String] = {
    chunk.foreach { case (id, json) => out.println(s"$id\t$json") }
    out.flush()
    Seq.empty
  }
  /** create-if-absent via atomic createNewFile: the loser of a
    * concurrent race sees `false` (the 400-on-exists analog) and treats
    * it as success; an existing index's metadata is never overwritten.
    */
  override def ensureIndex(index: String, settings: Map[String, String],
      mappings: String): Unit = {
    val meta = new java.io.File(
      new java.io.File(path).getAbsoluteFile.getParentFile,
      s"_index-$index.json")
    if (meta.createNewFile()) {
      val w = new java.io.PrintWriter(meta, "UTF-8")
      try w.println(BulkBackend.indexMetaJson(settings, mappings))
      finally w.close()
    }
  }
  override def close(): Unit = out.close()
}

/** `id \t json` lines through the Hadoop filesystem API — the
  * cluster-portable shipping target: `dir` may be any shared filesystem
  * (hdfs://, s3a://, file:// ...), so executor writes land where the
  * driver (and every other executor) can read them back.
  *
  * Write protocol (same discipline as the WARC DSv2 writer): the stream
  * goes to a hidden attempt-tagged temp file; [[commit]] renames it to
  * the DETERMINISTIC `fileName`, replacing any earlier attempt's output —
  * so task retries and speculative duplicates can never double-count.
  * [[close]] without a commit aborts: the temp file is deleted.
  */
final class HadoopJsonLinesBackend(
    dir: String,
    fileName: String,
    attemptTag: String,
    fsProps: Map[String, String] = Map.empty) extends BulkBackend {
  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration()
    fsProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
  private val tmp = new org.apache.hadoop.fs.Path(dir, s".$fileName.$attemptTag.tmp")
  private val dst = new org.apache.hadoop.fs.Path(dir, fileName)
  private var committed = false
  private var out = new java.io.PrintWriter(new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8)))

  override def bulkIndex(chunk: Seq[(String, String)]): Seq[String] = {
    chunk.foreach { case (id, json) => out.println(s"$id\t$json") }
    out.flush()
    Seq.empty
  }

  /** create-if-absent through the Hadoop FS, via write-to-temp +
    * rename-if-absent: Hadoop `rename` refuses an existing destination
    * (returns false / throws) on stores with atomic rename (HDFS,
    * local), so exactly one racer publishes and the loser cleans up its
    * temp — the 400-on-exists analog. On object stores WITHOUT atomic
    * rename (S3A emulates it as copy+delete) the contract degrades to
    * BEST-EFFORT: two racers can both publish and the later copy wins.
    * That only diverges when concurrent jobs race with DIFFERENT
    * settings on such a store; same-job racers write identical bytes.
    */
  override def ensureIndex(index: String, settings: Map[String, String],
      mappings: String): Unit = {
    val meta = new org.apache.hadoop.fs.Path(dir, s"_index-$index.json")
    if (fs.exists(meta)) return
    val metaTmp = new org.apache.hadoop.fs.Path(dir, s"._index-$index.$attemptTag.tmp")
    val o = fs.create(metaTmp, true)
    try o.write((BulkBackend.indexMetaJson(settings, mappings) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
    val won =
      try !fs.exists(meta) && fs.rename(metaTmp, meta)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    if (!won && fs.exists(metaTmp)) fs.delete(metaTmp, false)
  }

  /** Publish this attempt's output under the deterministic name. */
  def commit(): Unit = {
    out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"bulk sink: failed to commit $tmp -> $dst")
    committed = true
  }

  override def close(): Unit = {
    out.close()
    if (!committed && fs.exists(tmp)) fs.delete(tmp, false)
  }
}

/** Reference policy defaults: buffer 3200 / chunk 800 / initial backoff
  * 2s, max 600s, 10 retries (elasticsearch.py:60-66,177-227).
  */
final class BulkSink(
    backend: BulkBackend,
    bufferSize: Int = 3200,
    chunkSize: Int = 800,
    initialBackoffMs: Long = 2000,
    maxBackoffMs: Long = 600000,
    maxRetries: Int = 10,
    sleep: Long => Unit = Thread.sleep) {

  private val buffer = mutable.ArrayBuffer.empty[(String, String)]
  private var indexedCount = 0L
  private var retryCount = 0L
  def indexed: Long = indexedCount
  def retries: Long = retryCount

  def add(id: String, doc: String): Unit = {
    buffer += (id -> doc)
    if (buffer.size >= bufferSize) flush()
  }

  def flush(): Unit = {
    if (buffer.isEmpty) return
    // sort by id: stabilizes retry order (elasticsearch.py:183)
    val sorted = buffer.sortBy(_._1).toSeq
    buffer.clear()
    sorted.grouped(chunkSize).foreach(flushChunk)
  }

  private def flushChunk(chunk: Seq[(String, String)]): Unit = {
    var pending = chunk
    var attempt = 0
    var backoff = initialBackoffMs
    while (pending.nonEmpty) {
      val failedIds = backend.bulkIndex(pending).toSet
      indexedCount += pending.size - failedIds.size
      if (failedIds.isEmpty) return
      attempt += 1
      if (attempt > maxRetries)
        throw new java.io.IOException(
          s"bulk sink: ${failedIds.size} items still failing after $maxRetries retries")
      retryCount += 1
      sleep(backoff)
      backoff = math.min(backoff * 2, maxBackoffMs)
      pending = pending.filter(p => failedIds.contains(p._1))
    }
  }

  def close(): Unit = {
    flush()
    backend.close()
  }
}

object BulkSink {
  /** foreachPartition-ready writer: (id, json) rows into a per-partition
    * sink, flushed and closed at partition end. `ensureIndex` bootstraps
    * the target index (create-if-absent with settings/mappings) before
    * the first row — every partition calls it, the backend tolerates the
    * resulting creation races by contract.
    */
  def writer(newBackend: () => BulkBackend, bufferSize: Int = 3200,
      chunkSize: Int = 800, ensureIndex: Option[String] = None,
      indexSettings: Map[String, String] = Map.empty,
      indexMappings: String = "{}"): Iterator[(String, String)] => Unit = { rows =>
    val backend = newBackend()
    // until the sink owns the backend, a bootstrap failure must close
    // it here — an ensureIndex throw would otherwise leak the opened
    // per-partition stream across task retries
    var sinkOwns = false
    try {
      ensureIndex.foreach(backend.ensureIndex(_, indexSettings, indexMappings))
      val sink = new BulkSink(backend, bufferSize, chunkSize)
      sinkOwns = true
      try rows.foreach { case (id, doc) => sink.add(id, doc) }
      finally sink.close()
    } finally {
      if (!sinkOwns) { try backend.close() catch { case _: Exception => } }
    }
  }
}
