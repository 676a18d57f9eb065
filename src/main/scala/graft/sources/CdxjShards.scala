package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Shard a CONSOLIDATED member index (a single multi-archive CDXJ — the
  * form the reference CLI emits, fastwarc-py/fastwarc/cli.py:225-283,
  * and the pywb/OpenWayback collection convention) into per-file `.idx`
  * sidecars, as a small Spark job, so planning can go through the
  * bounded IdxSlice path instead of materializing and sorting every
  * line on the driver.
  *
  * Why: IdxSlice killed the O(members) driver term for per-file
  * sidecars, but a consolidated index pointed at via `member_index` was
  * still read and sorted at plan time — at 100 TB a pywb-convention
  * collection index is ~10^10 lines, the same tens-of-GB driver-heap
  * problem. The shard job is distributed (parse lines → hash-partition
  * by filename → sort within partition → stream one sidecar per file),
  * driver heap stays flat, and the result is CACHED keyed by the source
  * index's (path, mtime, length) fingerprint — planning the same
  * collection twice reuses the shards with zero job launches.
  *
  * The emitted sidecars are engine-format and offset-monotone by
  * construction (sorted + deduped in the writer), so every later plan
  * takes the zero-plan-read IdxSlice route and the executor-side prefix
  * probe passes.
  *
  * Scratch placement: `member_index_scratch` option, defaulting to
  * `{java.io.tmpdir}/graft_cdxj_shards` — correct for local mode; on a
  * multi-node cluster set it to a SHARED filesystem path (the executors
  * write the sidecars, the driver lists them). Any registered Hadoop
  * scheme works (the writer goes through the FileSystem API).
  */
object CdxjShards {

  /** Stable fingerprint of the source index set: any rewrite (mtime or
    * length change) invalidates the cache entry.
    */
  private def cacheKey(indexFiles: Seq[FileStatus]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    indexFiles.map(st => s"${st.getPath}|${st.getModificationTime}|${st.getLen}")
      .sorted
      .foreach(s => md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Ensure per-file sidecars exist for `indexFiles` and return them
    * keyed by data-file basename. Idempotent and concurrency-safe: tmp
    * names are unique, renames of identical content race harmlessly,
    * and `_SUCCESS` gates reuse.
    */
  def ensure(indexFiles: Seq[FileStatus], scratch: Option[String],
      conf: Configuration): Map[String, FileStatus] = {
    val base = scratch.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_cdxj_shards")
    val cacheDir = new Path(base, cacheKey(indexFiles))
    val fs = cacheDir.getFileSystem(conf)
    if (!fs.exists(new Path(cacheDir, "_SUCCESS"))) {
      val spark = SparkSession.active
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      fs.mkdirs(cacheDir)
      // serializable fs conf subset (same discipline as the scan's
      // reader factory) so executors can open any registered scheme
      val fsProps: Map[String, String] = {
        import scala.jdk.CollectionConverters._
        conf.iterator().asScala.map(e => e.getKey -> e.getValue)
          .filter { case (k, _) => k.startsWith("fs.") || k.startsWith("io.") }
          .toMap
      }
      val cacheDirStr = cacheDir.toString
      spark.read.textFile(indexFiles.map(_.getPath.toString): _*)
        .flatMap(l => WarcInput.parseIdxLine(l))
        .toDF("filename", "offset")
        // one partition owns all of a file's lines; sorted within, the
        // writer streams each sidecar without buffering it
        .repartition(col("filename"))
        .sortWithinPartitions("filename", "offset")
        .as[(String, Long)]
        .foreachPartition { (it: Iterator[(String, Long)]) =>
          val c = WarcInput.cachedConf(fsProps)
          val dir = new Path(cacheDirStr)
          val pfs = dir.getFileSystem(c)
          var cur: String = null
          var w: java.io.PrintWriter = null
          var tmp: Path = null
          var last = Long.MinValue
          def commit(): Unit = if (w != null) {
            w.close()
            // PrintWriter SWALLOWS I/O errors (ENOSPC mid-write would
            // otherwise rename a TRUNCATED sidecar into place, get
            // _SUCCESS-gated, and be reused forever via the fingerprint
            // cache) — check the error flag before publishing
            val failed = w.checkError()
            w = null
            if (failed) {
              pfs.delete(tmp, false)
              throw new java.io.IOException(
                s"cdxj shard write failed for $cur (disk full or I/O error)")
            }
            val fin = new Path(dir, cur + ".idx")
            pfs.delete(fin, false)
            if (!pfs.rename(tmp, fin)) {
              pfs.delete(tmp, false)
              throw new java.io.IOException(
                s"cdxj shard commit failed: rename $tmp -> $fin returned false")
            }
          }
          try {
            it.foreach { case (name, off) =>
              if (name != cur) {
                commit()
                cur = name; last = Long.MinValue
                tmp = new Path(dir,
                  s".$name.idx.${java.util.UUID.randomUUID()}.tmp")
                w = new java.io.PrintWriter(new java.io.BufferedWriter(
                  new java.io.OutputStreamWriter(pfs.create(tmp, true),
                    java.nio.charset.StandardCharsets.UTF_8)))
              }
              // dedup (CDXJ legally lists several captures per member)
              if (off != last) {
                w.println(s"""{"filename":${jsonStr(name)},"offset":$off}""")
                last = off
              }
            }
            commit()
          } finally if (w != null) {
            // failure path: close the in-flight writer and remove its
            // tmp so task retries never strand debris in the cache dir
            try w.close() catch { case _: Exception => }
            try pfs.delete(tmp, false) catch { case _: Exception => }
          }
        }
      fs.create(new Path(cacheDir, "_SUCCESS"), true).close()
    }
    fs.listStatus(cacheDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".idx"))
      .map(st => st.getPath.getName.stripSuffix(".idx") -> st)
      .toMap
  }
}
