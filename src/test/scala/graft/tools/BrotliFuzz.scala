package graft.tools

import java.nio.file.{Files, Paths}

/** Dev harness (test scope): decode every vector in /tmp/brotli_vectors
  * (written by the reference C encoder via brotlicffi) and compare with
  * the raw plaintext. Run: sbt "Test/runMain graft.tools.BrotliFuzz"
  */
object BrotliFuzz {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/brotli_vectors")
    val vecs = Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".br")).sorted
    var pass = 0
    var fail = 0
    vecs.foreach { brPath =>
      val raw = Files.readAllBytes(Paths.get(brPath.stripSuffix(".br") + ".raw"))
      try {
        val dec = graft.core.Brotli.decode(Files.readAllBytes(Paths.get(brPath)))
        if (java.util.Arrays.equals(dec, raw)) pass += 1
        else {
          fail += 1
          val diff = dec.zip(raw).indexWhere { case (a, b) => a != b }
          println(s"MISMATCH $brPath declen=${dec.length} rawlen=${raw.length} firstDiff=$diff")
        }
      } catch {
        case e: Throwable =>
          fail += 1
          println(s"ERROR $brPath: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"pass=$pass fail=$fail")
    if (fail > 0) sys.exit(1)
  }
}
