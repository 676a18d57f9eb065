package graft.sources

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** Test double for an object-store FileSystem (the `s3a://` shape the
  * scan maps S3 inputs to — fastwarc-py/fastwarc/cli.py:291-348): a
  * registered non-`file:` scheme backed by the local disk. Proves the
  * scan path holds through Hadoop's FileSystem abstraction (URI
  * resolution, glob listing, open/seek) for any object-store scheme,
  * which is everything s3a needs from the engine — the egress-blocked
  * environment cannot exercise the real connector.
  */
class TestObjectStoreFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def getScheme: String = "testfs"
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = Option(name.getAuthority) match {
      case Some(a) if a.nonEmpty => URI.create(s"${name.getScheme}://$a")
      case _ => URI.create(s"${name.getScheme}:///")
    }
  }
  override def getUri: URI = if (uri != null) uri else URI.create("testfs:///")
}

/** `s3` scheme double: proves the deployment-override path of the
  * reference-style `s3://` input handling — when `fs.s3.impl` IS bound,
  * the scan must use it verbatim instead of rewriting to s3a.
  */
class S3SchemeTestFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def getScheme: String = "s3"
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = Option(name.getAuthority) match {
      case Some(a) if a.nonEmpty => URI.create(s"${name.getScheme}://$a")
      case _ => URI.create(s"${name.getScheme}:///")
    }
  }
  override def getUri: URI = if (uri != null) uri else URI.create("s3:///")
}

/** Latency-injecting object-store double: every read() call of an
  * opened stream first parks for `perReadMicros` and returns at most
  * `maxChunkBytes` — the shape of a forward http(s)/object-store stream
  * where each socket read is a network round-trip returning one TCP
  * window's worth of bytes. This is the regime `async_decode` exists
  * for (core/AsyncChunkInputStream: overlap upstream round-trips with
  * downstream parse/extract work); AsyncDecodeSpec measures the scan
  * wall with and without the option over this FS.
  */
class LatencyObjectStoreFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def getScheme: String = "slowfs"
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = Option(name.getAuthority) match {
      case Some(a) if a.nonEmpty => URI.create(s"${name.getScheme}://$a")
      case _ => URI.create(s"${name.getScheme}:///")
    }
  }
  override def getUri: URI = if (uri != null) uri else URI.create("slowfs:///")

  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    if (LatencyObjectStoreFs.perReadMicros <= 0) inner
    else new org.apache.hadoop.fs.FSDataInputStream(
      new LatencyObjectStoreFs.SlowStream(inner,
        LatencyObjectStoreFs.perReadMicros, LatencyObjectStoreFs.maxChunkBytes))
  }
}

object LatencyObjectStoreFs {
  /** Injected round-trip per read() call, microseconds (0 = passthrough). */
  @volatile var perReadMicros: Long = 0L
  /** Max bytes a single read() returns (one "window"). */
  @volatile var maxChunkBytes: Int = 16 * 1024

  def reset(): Unit = { perReadMicros = 0L; maxChunkBytes = 16 * 1024 }

  private class SlowStream(inner: org.apache.hadoop.fs.FSDataInputStream,
      micros: Long, chunk: Int) extends org.apache.hadoop.fs.FSInputStream {
    private def rtt(): Unit =
      java.util.concurrent.locks.LockSupport.parkNanos(micros * 1000L)
    override def read(): Int = { rtt(); inner.read() }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      rtt()
      inner.read(b, off, math.min(len, chunk))
    }
    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def close(): Unit = inner.close()
  }
}

/** Flaky object-store double: the FIRST open of each path returns a
  * stream that dies (IOException, as a dropped connection would) after
  * `DieAfterBytes` raw bytes — mid-payload for the fixture archives —
  * and every subsequent open is clean. Proves the scan's
  * `stream_retries` resume (warc_retry) composes with the Hadoop
  * FileSystem layer: the retry factory re-opens the path through the FS
  * and the scan completes with every record and no error rows.
  */
class FlakyObjectStoreFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def getScheme: String = "flakyfs"
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = Option(name.getAuthority) match {
      case Some(a) if a.nonEmpty => URI.create(s"${name.getScheme}://$a")
      case _ => URI.create(s"${name.getScheme}:///")
    }
  }
  override def getUri: URI = if (uri != null) uri else URI.create("flakyfs:///")

  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    val attempt = FlakyObjectStoreFs.nextOpen(f.toUri.getPath)
    FlakyObjectStoreFs.dieAfterFor(attempt) match {
      case Some(dieAfter) =>
        new org.apache.hadoop.fs.FSDataInputStream(
          new FlakyObjectStoreFs.DyingStream(inner, dieAfter))
      case None => inner
    }
  }
}

object FlakyObjectStoreFs {
  val DieAfterBytes = 100000L // well inside the ~133 KiB fixture gzip

  /** Raw-byte die points per open attempt (1-based): the Nth open of any
    * path returns a stream that dies after schedule(N-1) bytes; opens
    * beyond the schedule are clean. Strictly increasing points model the
    * productive-flaky remote: every resume gets further before the
    * connection drops again (itertools.pyx:66-155's repeated-retry
    * loop). Default = the single first-open death.
    */
  @volatile var schedule: Seq[Long] = Seq(DieAfterBytes)

  private val opens = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def nextOpen(path: String): Int =
    opens.merge(path, 1, (a, b) => Integer.valueOf(a + b)).intValue
  def dieAfterFor(attempt: Int): Option[Long] =
    if (attempt <= schedule.length) Some(schedule(attempt - 1)) else None
  def opensOf(path: String): Int = Option(opens.get(path)).map(_.intValue).getOrElse(0)
  def reset(): Unit = { opens.clear(); schedule = Seq(DieAfterBytes) }

  /** Seekable stream that throws once `dieAfter` bytes have been read —
    * the dropped-connection shape (an IOException from read(), not EOF).
    */
  private class DyingStream(inner: org.apache.hadoop.fs.FSDataInputStream,
      dieAfter: Long) extends org.apache.hadoop.fs.FSInputStream {
    private var readBytes = 0L
    private def check(): Unit =
      if (readBytes >= dieAfter)
        throw new java.io.IOException("connection reset by peer (flaky test double)")
    override def read(): Int = {
      check()
      val b = inner.read()
      if (b >= 0) readBytes += 1
      b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      check()
      val n = inner.read(b, off, len)
      if (n > 0) readBytes += n
      n
    }
    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def close(): Unit = inner.close()
  }
}
