package graft.tools

import java.nio.file.{Files, Paths}

/** Dev: truncation/garbage robustness — every prefix and bit-flip must
  * throw (or return wrong data), never hang or OOM.
  */
object BrotliTrunc {
  def main(args: Array[String]): Unit = {
    val full = Files.readAllBytes(Paths.get("/tmp/brotli_vectors/0100.br"))
    var threw = 0
    var ok = 0
    (0 until full.length).foreach { n =>
      try {
        graft.core.Brotli.decode(java.util.Arrays.copyOf(full, n), maxOutput = 10 << 20)
        ok += 1
      } catch { case _: Exception => threw += 1 }
    }
    println(s"prefixes: threw=$threw completed=$ok of ${full.length}")
    val rnd = new scala.util.Random(5)
    var flipThrew = 0
    var flipOk = 0
    (0 until 500).foreach { _ =>
      val b = full.clone()
      b(rnd.nextInt(b.length)) = (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
      try { graft.core.Brotli.decode(b, maxOutput = 10 << 20); flipOk += 1 }
      catch { case _: Exception => flipThrew += 1 }
    }
    println(s"bitflips: threw=$flipThrew completed=$flipOk of 500")
  }
}
