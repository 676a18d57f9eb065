package graft.tools

import java.nio.file.{Files, Paths}

/** Dev: decode one vector and print output vs expected. */
object BrotliDbg {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    graft.core.Brotli.trace = true
    val dec = graft.core.Brotli.decode(Files.readAllBytes(Paths.get(base + ".br")))
    val raw = Files.readAllBytes(Paths.get(base + ".raw"))
    println("got: " + new String(dec.take(120), "ISO-8859-1").replace("\n", "\\n"))
    println("exp: " + new String(raw.take(120), "ISO-8859-1").replace("\n", "\\n"))
  }
}
