package graft.core

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Digest parsing/verification (reference: warc.pyx:940-978,1000-1024;
  * invalid digests verify false, never throw — test_warc.py:352-366).
  */
class DigestsSpec extends AnyFunSuite {

  private val data = "hello warc".getBytes(StandardCharsets.UTF_8)

  test("verifies sha1 base32 (the WARC-standard encoding)") {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(data)
    assert(Digests.verify("sha1:" + Digests.base32Encode(d), data))
  }

  test("verifies hex digests (non-standard but seen in the wild)") {
    val d = java.security.MessageDigest.getInstance("MD5").digest(data)
    val hex = d.map(b => f"$b%02x").mkString
    assert(Digests.verify("md5:" + hex, data))
  }

  test("all four algorithms round-trip") {
    for (alg <- Seq("md5", "sha1", "sha256", "sha512")) {
      val d = Digests.digest(alg, data).get
      assert(Digests.verify(s"$alg:${Digests.base32Encode(d)}", data), alg)
    }
  }

  test("invalid digests verify false, never throw") {
    assert(!Digests.verify("sha1:!!!notbase32!!!", data))
    assert(!Digests.verify("nodigest", data))
    assert(!Digests.verify("unknownalg:AAAA", data))
    assert(!Digests.verify("", data))
    val wrong = Digests.base32Encode(
      java.security.MessageDigest.getInstance("SHA-1").digest("other".getBytes))
    assert(!Digests.verify("sha1:" + wrong, data))
  }

  test("law: base32 encode/decode round-trips arbitrary bytes (seeded random)") {
    val rnd = new scala.util.Random(7)
    for (n <- 1 to 64; _ <- 1 to 4) {
      val arr = new Array[Byte](n)
      rnd.nextBytes(arr)
      val enc = Digests.base32Encode(arr)
      assert(Digests.decodeBase32(enc).exists(_.sameElements(arr)), s"len $n")
    }
  }

  test("base32 decode is case-insensitive") {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(data)
    val enc = Digests.base32Encode(d)
    assert(Digests.verify("sha1:" + enc.toLowerCase, data))
  }
}
