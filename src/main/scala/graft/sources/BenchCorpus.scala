package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic multi-file WARC bench corpus: N files, each `copies`
  * back-to-back copies of the 50-record fixture archive. Concatenating
  * gzip archives is valid multi-member gzip (the reference writes one
  * member per record for exactly this reason), so each output file is a
  * well-formed WARC with copies*50 records.
  *
  * This makes the BASELINE gzip-scan throughput (~10.4k records/s/core,
  * BASELINE.md) measurable: w17/w18 scan this corpus and their bench
  * timings give records/s.
  */
object BenchCorpus {

  val FixtureGz = "/root/reference/tests/data/warcfile.warc.gz"
  val RecordsPerCopy = 50

  /** Create (once) and return the corpus directory. */
  def ensure(dir: String, files: Int = 10, copiesPerFile: Int = 20): String =
    synchronized {
      val d = Paths.get(dir)
      val marker = d.resolve(s"READY-$files-$copiesPerFile")
      if (Files.exists(marker)) return dir
      Files.createDirectories(d)
      val src = Files.readAllBytes(Paths.get(FixtureGz))
      (0 until files).foreach { i =>
        val tmp = d.resolve(s".part-$i.tmp")
        val out = Files.newOutputStream(tmp)
        try (0 until copiesPerFile).foreach(_ => out.write(src))
        finally out.close()
        Files.move(tmp, d.resolve(f"bench-$i%03d.warc.gz"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(marker, Array.emptyByteArray)
      dir
    }

  def totalRecords(files: Int = 10, copiesPerFile: Int = 20): Long =
    files.toLong * copiesPerFile * RecordsPerCopy
}
