package graft.core

import java.security.MessageDigest
import java.util.Locale

/** WARC digest verification: `alg:digest` where digest is base32
  * (standard per WARC spec) or, from some tools, hex
  * (reference behavior: fastwarc-py/fastwarc/warc.pyx:940-978,1000-1024).
  * Invalid digests never throw — they verify false
  * (test_warc.py:352-366 "test_invalid_digests").
  */
object Digests {

  private val Algs = Map(
    "md5" -> "MD5", "sha1" -> "SHA-1", "sha256" -> "SHA-256", "sha512" -> "SHA-512")

  def digest(alg: String, data: Array[Byte]): Option[Array[Byte]] =
    Algs.get(alg.toLowerCase(Locale.ROOT)).map(MessageDigest.getInstance(_).digest(data))

  /** Parse `alg:value` into (javaAlg, rawBytes), accepting base32 or hex. */
  def parse(headerValue: String): Option[(String, Array[Byte])] = {
    val colon = headerValue.indexOf(':')
    if (colon <= 0) return None
    val alg = headerValue.substring(0, colon).toLowerCase(Locale.ROOT)
    if (!Algs.contains(alg)) return None
    val value = headerValue.substring(colon + 1).trim
    decodeBase32(value).orElse(decodeHex(value)).map(alg -> _)
  }

  def verify(headerValue: String, data: Array[Byte]): Boolean =
    parse(headerValue) match {
      case Some((alg, expected)) =>
        digest(alg, data).exists(MessageDigest.isEqual(_, expected))
      case None => false
    }

  private val B32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 decode (with '=' padding), case-insensitive. */
  private[core] def decodeBase32(s0: String): Option[Array[Byte]] = {
    val s = s0.toUpperCase(Locale.ROOT).reverse.dropWhile(_ == '=').reverse
    if (s.isEmpty) return None
    var buf = 0L; var bits = 0
    val out = new java.io.ByteArrayOutputStream(s.length * 5 / 8 + 1)
    var i = 0
    while (i < s.length) {
      val v = B32Alphabet.indexOf(s.charAt(i))
      if (v < 0) return None
      buf = (buf << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out.write(((buf >> bits) & 0xff).toInt)
      }
      i += 1
    }
    Some(out.toByteArray)
  }

  private[core] def decodeHex(s: String): Option[Array[Byte]] = {
    if (s.isEmpty || s.length % 2 != 0) return None
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < s.length) {
      val hi = Character.digit(s.charAt(i), 16)
      val lo = Character.digit(s.charAt(i + 1), 16)
      if (hi < 0 || lo < 0) return None
      out(i / 2) = ((hi << 4) | lo).toByte
      i += 2
    }
    Some(out)
  }

  def base32Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var buf = 0L; var bits = 0
    data.foreach { b =>
      buf = (buf << 8) | (b & 0xff); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(B32Alphabet(((buf >> bits) & 31).toInt)) }
    }
    if (bits > 0) sb.append(B32Alphabet(((buf << (5 - bits)) & 31).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }
}
