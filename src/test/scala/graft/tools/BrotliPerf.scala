package graft.tools

/** Dev: decode throughput on the fixture archive + a large text stream. */
object BrotliPerf {
  def main(args: Array[String]): Unit = {
    def res(n: String) = {
      val in = getClass.getResourceAsStream(s"/graft/$n")
      try in.readAllBytes() finally in.close()
    }
    val warc = res("warcfile.warc.br")
    val big = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/brotli_vectors2/0025.br")) // 5.4MB text
    Seq(("warc.br", warc, 20), ("big-text", big, 5)).foreach { case (name, data, reps) =>
      graft.core.Brotli.decode(data); graft.core.Brotli.decode(data) // warm
      val t0 = System.nanoTime()
      var out = 0L
      (0 until reps).foreach(_ => out += graft.core.Brotli.decode(data).length)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-10s ${out / sec / 1e6}%8.1f MB/s decoded (${out / reps} bytes/rep)")
    }
  }
}
