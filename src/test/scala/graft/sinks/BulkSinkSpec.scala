package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Buffer/sort/chunk/retry/backoff policy of the bulk sink (reference
  * policy: elasticsearch.py:36-227), tested against a mock backend.
  */
class BulkSinkSpec extends AnyFunSuite {

  private class MockBackend(failFirstNAttempts: Int = 0) extends BulkBackend {
    val chunks = mutable.ArrayBuffer.empty[Seq[String]]
    val indexed = mutable.ArrayBuffer.empty[String]
    private var attempts = 0
    override def bulkIndex(chunk: Seq[(String, String)]): Seq[String] = {
      chunks += chunk.map(_._1)
      attempts += 1
      if (attempts <= failFirstNAttempts) chunk.map(_._1) // all retryable
      else { indexed ++= chunk.map(_._1); Seq.empty }
    }
  }

  test("buffers, sorts by id, and flushes in chunks") {
    val backend = new MockBackend()
    val sink = new BulkSink(backend, bufferSize = 10, chunkSize = 4, sleep = _ => ())
    // unsorted ids; buffer fills at 10 -> auto flush
    (10 to 1 by -1).foreach(i => sink.add(f"id$i%02d", s"{}"))
    assert(backend.chunks.size == 3) // 4+4+2
    assert(backend.chunks.flatten.toSeq == (1 to 10).map(i => f"id$i%02d"))
    sink.close()
    assert(sink.indexed == 10L)
  }

  test("retries failed items with exponential backoff") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val backend = new MockBackend(failFirstNAttempts = 3)
    val sink = new BulkSink(backend, bufferSize = 100, chunkSize = 100,
      initialBackoffMs = 2, maxBackoffMs = 1000, maxRetries = 10,
      sleep = sleeps.append)
    (1 to 5).foreach(i => sink.add(s"id$i", "{}"))
    sink.close()
    assert(sink.indexed == 5L)
    assert(sink.retries == 3L)
    assert(sleeps.toSeq == Seq(2L, 4L, 8L)) // doubling
  }

  test("gives up after maxRetries with an error") {
    val backend = new MockBackend(failFirstNAttempts = 100)
    val sink = new BulkSink(backend, bufferSize = 10, chunkSize = 10,
      initialBackoffMs = 1, maxRetries = 3, sleep = _ => ())
    sink.add("a", "{}")
    intercept[java.io.IOException] { sink.close() }
  }

  test("hadoop backend: deterministic name, tmp+rename commit, retry-safe") {
    val dir = java.nio.file.Files.createTempDirectory("bulk_hfs").toString
    // ignore hidden files: the local ChecksumFileSystem writes .crc
    // sidecars, which Spark/Hadoop readers skip by convention
    def listing = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    // attempt 0 commits a partial file (as a failed-then-speculated task
    // might); attempt 1 re-runs the SAME partition and must fully replace it
    val a0 = new HadoopJsonLinesBackend(dir, "part-00000.jsonl", "attempt-0")
    a0.bulkIndex(Seq("1" -> """{"v":1}"""))
    a0.commit(); a0.close()
    val a1 = new HadoopJsonLinesBackend(dir, "part-00000.jsonl", "attempt-1")
    a1.bulkIndex(Seq("1" -> """{"v":1}""", "2" -> """{"v":2}"""))
    a1.commit(); a1.close()
    assert(listing == Seq("part-00000.jsonl")) // one survivor, no temps
    val lines = scala.io.Source.fromFile(s"$dir/part-00000.jsonl").getLines().toSeq
    assert(lines == Seq("1\t{\"v\":1}", "2\t{\"v\":2}")) // only attempt 1's output
    // an aborted attempt (close without commit) leaves nothing behind
    val a2 = new HadoopJsonLinesBackend(dir, "part-00001.jsonl", "attempt-0")
    a2.bulkIndex(Seq("9" -> "{}"))
    a2.close()
    assert(listing == Seq("part-00000.jsonl"))
    // the landing dir is addressed through the Hadoop FS API (shared-FS
    // semantics), not executor-local java.io temp state
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "part-00000.jsonl")))
  }

  test("ensure_index: create-if-absent with settings/mappings, no-op when " +
      "present, concurrent-race loser tolerated (reference " +
      "beam/elasticsearch.py:281-303)") {
    // mock: records create calls; a second create for the same name
    // simulates the ES 400 resource_already_exists
    val created = mutable.Map.empty[String, String]
    var creates = 0
    class EsLike extends BulkBackend {
      override def bulkIndex(chunk: Seq[(String, String)]): Seq[String] = Seq.empty
      override def ensureIndex(index: String, settings: Map[String, String],
          mappings: String): Unit = {
        if (!created.contains(index)) { // indices.exists
          creates += 1
          // indices.create — the loser of a concurrent race gets the
          // already-exists failure, which the policy treats as success
          created.getOrElseUpdate(index,
            BulkBackend.indexMetaJson(settings, mappings))
        }
      }
    }
    val b = new EsLike
    b.ensureIndex("docs", Map("number_of_shards" -> "4"),
      """{"properties":{"text":{"type":"text"}}}""")
    b.ensureIndex("docs", Map("number_of_shards" -> "9")) // exists: no-op
    assert(creates == 1)
    assert(created("docs").contains("number_of_shards\":\"4"))
    assert(created("docs").contains("\"text\":{\"type\":\"text\"}"))
  }

  test("ensure_index on the file backends: atomic metadata sidecar, " +
      "never overwritten, races land one winner") {
    val dir = java.nio.file.Files.createTempDirectory("bulk_ensure").toString
    val jl = new JsonLinesBackend(s"$dir/out.jsonl")
    jl.ensureIndex("webidx", Map("refresh_interval" -> "30s"))
    jl.ensureIndex("webidx", Map("refresh_interval" -> "1s")) // second call: no-op
    jl.close()
    val metaFile = new java.io.File(dir, "_index-webidx.json")
    assert(metaFile.exists())
    val meta = scala.io.Source.fromFile(metaFile).mkString
    assert(meta.contains("\"refresh_interval\":\"30s\""), meta) // first writer won
    // hadoop backend: same contract through the FS API, concurrent
    // ensureIndex from two "partitions" leaves exactly one winner
    val h1 = new HadoopJsonLinesBackend(dir, "p0.jsonl", "a0")
    val h2 = new HadoopJsonLinesBackend(dir, "p1.jsonl", "a0")
    h1.ensureIndex("hidx", Map("codec" -> "best_compression"))
    h2.ensureIndex("hidx", Map("codec" -> "default")) // exists: tolerated no-op
    h1.commit(); h1.close(); h2.commit(); h2.close()
    val hmeta = scala.io.Source.fromFile(new java.io.File(dir, "_index-hidx.json")).mkString
    assert(hmeta.contains("\"codec\":\"best_compression\""), hmeta)
  }

  test("writer() bootstraps the index before the first row") {
    val dir = java.nio.file.Files.createTempDirectory("bulk_wboot").toString
    val w = BulkSink.writer(() => new JsonLinesBackend(s"$dir/out.jsonl"),
      ensureIndex = Some("bootidx"), indexSettings = Map("k" -> "v"))
    w(Iterator("a" -> "{}"))
    assert(new java.io.File(dir, "_index-bootidx.json").exists())
    assert(scala.io.Source.fromFile(s"$dir/out.jsonl").getLines().toSeq == Seq("a\t{}"))
  }

  test("json-lines backend round-trips") {
    val tmp = java.nio.file.Files.createTempFile("bulk", ".jsonl")
    java.nio.file.Files.delete(tmp)
    val sink = new BulkSink(new JsonLinesBackend(tmp.toString), bufferSize = 2)
    sink.add("b", """{"x":1}""")
    sink.add("a", """{"x":2}""")
    sink.close()
    val lines = scala.io.Source.fromFile(tmp.toFile).getLines().toSeq
    assert(lines == Seq("a\t{\"x\":2}", "b\t{\"x\":1}")) // sorted by id
    java.nio.file.Files.delete(tmp)
  }
}
