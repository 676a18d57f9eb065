package graft.core

import java.io.InputStream

/** Robustness utilities: scan resume after stream failure (the
  * reference's `warc_retry`, resiliparse-py/resiliparse/itertools.pyx:
  * 66-155) and per-record time containment (`TimeGuard` analog,
  * process_guard.pyx:184-533). Spark task retry covers whole-task
  * failures for free; these cover the in-task cases — a flaky remote
  * stream that dies mid-scan, and one pathological document that must
  * not stall a 1000-executor job.
  */
/** Per-record memory containment breach (the reference MemGuard's
  * `MemoryLimitExceeded`, process_guard.pyx:184-533): thrown by budgeted
  * kernels (DOM parse, extraction) when one record's in-memory expansion
  * exceeds its configured budget. Catch it at the operator boundary and
  * surface an error COLUMN (exc_loop doctrine) — one pathological
  * document must cost one error row, never an executor OOM.
  */
final class MemGuardException(msg: String) extends RuntimeException(msg)

object WarcRetry {

  /** Iterate a WARC stream with resume-on-failure: when the underlying
    * stream dies mid-scan (reader.streamError), re-open via `factory`,
    * skip forward to the last good position, drop the duplicate record,
    * and continue. At most `maxRetries` reopens.
    *
    * The factory returns a FRESH raw stream each call (e.g. re-open the
    * S3 object); codec sniffing reruns per attempt.
    */
  /** @param memberListener compressed member-start offsets as the codec
    *        decoder crosses them (the `emit_member_index` side-output).
    *        Fires on EVERY attempt — a reopen re-decodes from offset 0
    *        to the resume point, re-crossing earlier members — so the
    *        consumer must dedupe by offset before use.
    */
  def iterator(
      factory: () => InputStream,
      filename: String,
      opts: WarcParseOptions = WarcParseOptions(),
      maxRetries: Int = 3,
      memberListener: Long => Unit = null): Iterator[WarcRecord] = new Iterator[WarcRecord] {

    private var retriesLeft = maxRetries
    private var reader: WarcByteReader = _
    private var parser: WarcParser = _
    private var lastGoodEnd = 0L // position after the last emitted record
    private var nextRec: WarcRecord = _
    private var finished = false

    /** Message from the most recent open attempt that THREW (factory or
      * codec sniff) — the reference counts stream_factory exceptions as
      * failed attempts too (itertools.pyx:66-155), and connection-refused
      * on reopen is the common flaky-remote failure mode.
      */
    private var lastOpenError: Option[String] = None

    /** (Re)open at `resumeAt`; false when the fresh stream could not
      * reach the resume position (it died or came up short during the
      * skip-forward), or when the factory / codec sniff itself threw —
      * either way ANOTHER failed attempt, not end-of-archive.
      */
    private def open(resumeAt: Long): Boolean =
      try {
        val (stream, _) = WarcCodecs.open(factory(), memberListener)
        reader = new WarcByteReader(stream)
        if (resumeAt > 0 && !reader.skipFully(resumeAt)) { parser = null; false }
        else { parser = new WarcParser(reader, filename, opts); true }
      } catch {
        case scala.util.control.NonFatal(e) =>
          lastOpenError = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
          parser = null
          false
      }

    /** Reopen until one attempt reaches the resume point or retries run
      * out; false = retries exhausted (a terminal condition the caller
      * must surface, never a silent end).
      */
    private var resumeFailed = false
    private def reopenWithRetries(): Boolean = {
      var ok = false
      while (!ok && retriesLeft > 0) {
        retriesLeft -= 1
        ok = open(lastGoodEnd)
      }
      // a failed skip-forward on a CLEAN-short stream leaves no
      // streamError behind — remember the failure so the terminal
      // branch still surfaces it
      if (!ok) resumeFailed = true
      ok
    }
    // the INITIAL open can fail the same way a reopen can (connection
    // refused before the first byte) — burn retries on it too
    if (!open(0L)) reopenWithRetries()

    private def advance(): Unit = {
      while (nextRec == null && !finished) {
        val hadNext = parser != null && parser.hasNext
        if (hadNext) {
          val r = parser.next()
          if (r.error.exists(_.startsWith("truncated record")) &&
              reader.streamError.isDefined && retriesLeft > 0 &&
              reopenWithRetries()) {
            // stream died mid-record: reopened; re-read this record
          } else {
            lastGoodEnd = reader.position
            nextRec = r
          }
        } else if (reader != null && reader.streamError.isDefined &&
            retriesLeft > 0 && reopenWithRetries()) {
          // stream died between records: reopened; continue
        } else {
          // either clean end-of-archive, or the stream died with no
          // (successful) retries left. The second case must NOT end
          // silently — that is a truncation the caller can't see (the
          // exc_loop error-row doctrine applies to exhausted retries
          // too): surface one terminal error record.
          if ((reader != null && reader.streamError.isDefined) || resumeFailed)
            nextRec = WarcRecord(filename, -1L, 0L, None, "unknown",
              RecordType.mask("unknown"), None, -1L, HeaderMap.empty,
              Array.emptyByteArray, None,
              Some(s"stream error after $maxRetries retries: " +
                Option(reader).flatMap(_.streamError).orElse(lastOpenError)
                  .getOrElse("resume skip-forward failed")))
          finished = true
        }
      }
    }

    override def hasNext: Boolean = { advance(); nextRec != null }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }
}

/** Per-record time containment: run a kernel with a wall-clock budget,
  * interrupting the worker thread when exceeded — one pathological
  * document must not stall the task (reference TimeGuard semantics;
  * the escalation ladder collapses to interrupt + error value on the
  * JVM, combined with the scan's default length caps).
  */
object TimeGuard {

  private[core] lazy val watchdog = {
    val t = java.util.concurrent.Executors.newScheduledThreadPool(1, r => {
      val th = new Thread(r, "graft-timeguard")
      th.setDaemon(true)
      th
    })
    t
  }

  /** Either the result or an error message on timeout/failure. The
    * kernel should be interruptible or bounded (every graft kernel is:
    * parsers are single-pass over bounded input).
    */
  def timeLimited[T](maxMillis: Long)(f: => T): Either[String, T] = {
    val worker = Thread.currentThread()
    // the monitor makes interrupt delivery and the final flag-clear
    // mutually exclusive: once `done` is set under the lock, the watchdog
    // can never interrupt this (by then possibly unrelated) task thread
    val lock = new Object
    var done = false
    var fired = false
    val task = watchdog.schedule(new Runnable {
      override def run(): Unit = lock.synchronized {
        if (!done) { fired = true; worker.interrupt() }
      }
    }, maxMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
    def firedNow: Boolean = lock.synchronized(fired)
    try {
      val out = f
      if (firedNow) Left(s"time guard: exceeded ${maxMillis}ms")
      else Right(out)
    } catch {
      case _: InterruptedException => Left(s"time guard: exceeded ${maxMillis}ms")
      case e: Throwable =>
        if (firedNow) Left(s"time guard: exceeded ${maxMillis}ms")
        else Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      lock.synchronized { done = true }
      task.cancel(false)
      Thread.interrupted() // clear any interrupt that landed before `done`
    }
  }

  /** The reference's `progress_loop` semantics (itertools.pyx /
    * process_guard.pyx progress(): a heartbeat RESETS the guard): a
    * kernel that keeps reporting progress is never interrupted — only
    * a STALLED one. `f` receives the heartbeat thunk; the watchdog
    * samples at maxMillis/4 granularity, so interruption lands within
    * ~1.25× the budget after the LAST heartbeat. Same
    * delivery-vs-completion locking discipline as [[timeLimited]].
    */
  def timeLimitedWithProgress[T](maxMillis: Long)(
      f: (() => Unit) => T): Either[String, T] = {
    val worker = Thread.currentThread()
    val lock = new Object
    var done = false
    var fired = false
    @volatile var deadline = System.nanoTime() + maxMillis * 1000000L
    val heartbeat: () => Unit =
      () => deadline = System.nanoTime() + maxMillis * 1000000L
    val period = math.max(1L, maxMillis / 4)
    val task = watchdog.scheduleAtFixedRate(new Runnable {
      override def run(): Unit = lock.synchronized {
        if (!done && !fired && System.nanoTime() > deadline) {
          fired = true; worker.interrupt()
        }
      }
    }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    def firedNow: Boolean = lock.synchronized(fired)
    try {
      val out = f(heartbeat)
      if (firedNow) Left(s"time guard: stalled past ${maxMillis}ms")
      else Right(out)
    } catch {
      case _: InterruptedException => Left(s"time guard: stalled past ${maxMillis}ms")
      case e: Throwable =>
        if (firedNow) Left(s"time guard: stalled past ${maxMillis}ms")
        else Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      lock.synchronized { done = true }
      task.cancel(false)
      Thread.interrupted()
    }
  }

  /** `progress_loop(it, budget)`: drive an iterator under a PER-ITEM
    * stall budget — each yielded element re-arms the guard, so a long
    * but steadily-progressing stream is never killed while one stuck
    * element still is. Returns the number of items processed or the
    * stall error.
    */
  def progressLoop[T](it: Iterator[T], maxMillisPerItem: Long)(
      body: T => Unit): Either[String, Long] =
    timeLimitedWithProgress(maxMillisPerItem) { heartbeat =>
      var n = 0L
      while (it.hasNext) {
        body(it.next())
        heartbeat()
        n += 1
      }
      n
    }
}

/** Per-record MEMORY containment beyond the static budgets (node count,
  * decode cap): runs a kernel under an allocation budget, sampled from
  * the JVM's per-thread allocated-bytes counter by the shared watchdog,
  * interrupting the worker on breach (reference MemGuard semantics,
  * process_guard.pyx:184-533 — the resident-size watchdog re-expressed
  * for a shared-JVM executor, where per-thread allocation is the only
  * attribution of one record's expansion that doesn't blame neighbors).
  *
  * Like the reference's process_guard this is OPT-IN per call site (the
  * default extraction path keeps its free static budgets); kernels
  * cooperate by polling [[MemGuard.poll]] between allocation phases.
  */
object MemGuard {

  private val threadMx: com.sun.management.ThreadMXBean =
    java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]

  /** Cheap cooperative cancellation point for kernels (one volatile
    * read): throws when a guard (time or memory) has interrupted the
    * worker. Does NOT clear the flag — the guard wrapper owns that.
    */
  @inline def poll(): Unit =
    if (Thread.currentThread().isInterrupted)
      throw new InterruptedException("kernel interrupted by guard")

  /** Either the result or an error message when the kernel allocates
    * more than `maxBytes` (sampled every `sampleMillis`; detection lag
    * is one sample, so the true bound is maxBytes + one sample's worth
    * of allocation — containment, not accounting).
    */
  def allocationLimited[T](maxBytes: Long, sampleMillis: Long = 20)(f: => T): Either[String, T] = {
    if (!threadMx.isThreadAllocatedMemorySupported)
      return try Right(f) catch {
        case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    val worker = Thread.currentThread()
    val start = threadMx.getThreadAllocatedBytes(worker.getId)
    val lock = new Object
    var done = false
    var fired = false
    val task = TimeGuard.watchdog.scheduleWithFixedDelay(new Runnable {
      override def run(): Unit = lock.synchronized {
        if (!done && threadMx.getThreadAllocatedBytes(worker.getId) - start > maxBytes) {
          fired = true
          worker.interrupt()
        }
      }
    }, sampleMillis, sampleMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
    def firedNow: Boolean = lock.synchronized(fired)
    def breachMsg = s"mem guard: allocation budget $maxBytes bytes exceeded"
    try {
      val out = f
      if (firedNow) Left(breachMsg) else Right(out)
    } catch {
      case e: InterruptedException =>
        if (firedNow) Left(breachMsg)
        else {
          // NOT ours: an external cancellation (Spark task kill,
          // speculation) — restore the flag and let it propagate, or the
          // task would misreport a breach and keep running dead work
          Thread.currentThread().interrupt()
          throw e
        }
      case e: Throwable =>
        if (firedNow) Left(breachMsg)
        else Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      lock.synchronized { done = true }
      task.cancel(false)
      // clear OUR late interrupt only; an external one was re-asserted
      // above and must survive this cleanup
      if (firedNow) Thread.interrupted()
    }
  }
}
