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

  def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$SessionToken"

  /** The dir path, with any previous run's contents deleted. */
  def fresh(name: String): java.io.File = {
    val f = new java.io.File(dir(name))
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f
  }
}
