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

  // best-effort: this session's scratch dirs die with the JVM — without
  // this every Verify/Bench process leaves its token's staging dirs in
  // tmp forever (observed: hundreds of ~9 MB trees after a few rounds)
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val mine = tmp.listFiles((_, n: String) =>
      n.startsWith("graft_") && n.endsWith(s"_$SessionToken"))
    if (mine != null) mine.foreach { f =>
      try org.apache.commons.io.FileUtils.deleteDirectory(f)
      catch { case _: Exception => () }
    }
  }, "graft-scratch-cleanup"))

  def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$SessionToken"

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
