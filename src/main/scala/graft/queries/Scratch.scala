package graft.queries

/** Session-unique tmp-dir scheme shared by every query family that
  * stages under java.io.tmpdir: concurrent sessions must not race on
  * staging paths or memory-sink names, while within one JVM re-runs
  * reuse the same delete-first dir so repeated bench sweeps don't leak
  * tmp space. (BenchCorpus paths are deliberately NOT session-scoped —
  * their cross-run reuse is the point.)
  */
private[graft] object Scratch {
  val SessionToken: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Root for TRANSIENT per-run streaming state (checkpoint WALs,
    * landing waves): prefer a tmpfs when one is writable. Micro-batch
    * fixed cost is dominated by checkpoint-log fsyncs (offset WAL +
    * commit log per batch, state-store delta files) which tmpfs makes
    * free; the data is worthless across runs so RAM-backed is the right
    * durability. Override/disable with SPARK_GRAFT_FAST_TMP (set it to
    * the plain tmp dir to opt out). On a real cluster executors would
    * point this at a local SSD/ramdisk while DURABLE checkpoints of
    * production streams live on the distributed FS — these gauges'
    * checkpoints are per-run scaffolding, not recovery state.
    */
  val FastRoot: String =
    (sys.env.get("SPARK_GRAFT_FAST_TMP").toSeq ++
      Seq("/dev/shm", System.getProperty("java.io.tmpdir")))
      .find { p =>
        val f = new java.io.File(p)
        // a container tmpfs is commonly mounted tiny (64 MB); streaming
        // checkpoint WALs that previously landed in tmpdir must not start
        // failing ENOSPC because a small /dev/shm exists — require real
        // headroom before preferring it (explicit override skips the check)
        f.isDirectory && f.canWrite &&
          (p != "/dev/shm" || sys.env.get("SPARK_GRAFT_FAST_TMP").contains(p) ||
            f.getUsableSpace >= 512L * 1024 * 1024)
      }.getOrElse(throw new IllegalStateException(
        "no writable scratch root: tried SPARK_GRAFT_FAST_TMP, /dev/shm " +
          "(needs >=512 MiB free), and java.io.tmpdir=" +
          System.getProperty("java.io.tmpdir")))

  // best-effort: this session's scratch dirs die with the JVM — without
  // this every Verify/Bench process leaves its token's staging dirs in
  // tmp forever (observed: hundreds of ~9 MB trees after a few rounds)
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    Seq(System.getProperty("java.io.tmpdir"), FastRoot).distinct.foreach { root =>
      val mine = new java.io.File(root).listFiles((_, n: String) =>
        n.startsWith("graft_") && n.endsWith(s"_$SessionToken"))
      if (mine != null) mine.foreach { f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: Exception => () }
      }
    }
  }, "graft-scratch-cleanup"))

  def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$SessionToken"

  /** [[fresh]], but under [[FastRoot]] — for checkpoint/landing dirs of
    * the streaming gauges only (outputs the driver reads stay in tmp).
    */
  def fastFresh(name: String): java.io.File = {
    val f = new java.io.File(s"$FastRoot/graft_${name}_$SessionToken")
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f
  }

  /** The dir path, with any previous run's contents deleted.
    *
    * SEQUENTIAL-EXECUTION ASSUMPTION: within one JVM, two concurrent
    * invocations of the same query would clobber each other's dir
    * (delete-first, session-fixed path). Verify, Bench, and the spec
    * suites all drive queries sequentially; a future parallel harness
    * must add a per-invocation component here (at the cost of the tmp
    * leak this scheme exists to prevent) or serialize per query name.
    */
  def fresh(name: String): java.io.File = {
    val f = new java.io.File(dir(name))
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f
  }
}
