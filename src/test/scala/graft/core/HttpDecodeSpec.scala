package graft.core

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Chunked decode (http.pyx:28-63 semantics) and the Content-/Transfer-
  * Encoding reverse decode chain (warc.pyx:785-837).
  */
class HttpDecodeSpec extends AnyFunSuite {

  private def gzipped(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
    out.toByteArray
  }

  private def deflated(s: String, raw: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    d.setInput(s.getBytes(StandardCharsets.UTF_8)); d.finish()
    val buf = new Array[Byte](1 << 16)
    val n = d.deflate(buf)
    java.util.Arrays.copyOf(buf, n)
  }

  test("dechunk reassembles a well-formed chunked body") {
    val chunked = "4\r\nWiki\r\n7\r\npedia i\r\nB\r\nn \r\nchunks.\r\n0\r\n\r\n"
    val out = HttpDecode.dechunk(chunked.getBytes(StandardCharsets.US_ASCII))
    assert(out.map(new String(_, StandardCharsets.US_ASCII)).contains("Wikipedia in \r\nchunks."))
  }

  test("dechunk tolerates chunk extensions and truncation") {
    val ext = "5;name=val\r\nhello\r\n0\r\n\r\n"
    assert(HttpDecode.dechunk(ext.getBytes).map(new String(_)).contains("hello"))
    val truncated = "A\r\nhell" // claims 10 bytes, has 4
    assert(HttpDecode.dechunk(truncated.getBytes).map(new String(_)).contains("hell"))
    assert(HttpDecode.dechunk("not chunked at all".getBytes).isEmpty)
  }

  test("gzip content-encoding decodes") {
    val d = HttpDecode.decodeBody(gzipped("payload"), Some("gzip"), None)
    assert(new String(d.body) == "payload")
    assert(d.applied == Seq("gzip") && d.failed.isEmpty)
  }

  test("deflate decodes both zlib-wrapped and raw variants") {
    for (raw <- Seq(false, true)) {
      val d = HttpDecode.decodeBody(deflated("data", raw), Some("deflate"), None)
      assert(new String(d.body) == "data", s"raw=$raw")
    }
  }

  test("transfer chunked + content gzip chain decodes in reverse order") {
    val gz = gzipped("chained payload")
    val chunked = s"${gz.length.toHexString}\r\n".getBytes ++ gz ++ "\r\n0\r\n\r\n".getBytes
    val d = HttpDecode.decodeBody(chunked, Some("gzip"), Some("chunked"))
    assert(new String(d.body) == "chained payload")
    assert(d.applied == Seq("gzip", "chunked") || d.applied == Seq("chunked", "gzip"))
    assert(d.failed.isEmpty)
  }

  test("unsupported encoding stops the chain, reports failure, keeps bytes") {
    val data = "compressed-with-lzw".getBytes
    val d = HttpDecode.decodeBody(data, Some("compress"), None)
    assert(d.failed.contains("compress"))
    assert(d.body.sameElements(data))
  }

  test("corrupt brotli body fails soft with the br label") {
    // NB brotli has no magic bytes, so SOME garbage parses as a valid
    // stream; this pattern provably does not
    val data = Array.fill[Byte](64)(0x55)
    val d = HttpDecode.decodeBody(data, Some("br"), None)
    assert(d.failed.contains("br"))
    assert(d.body.sameElements(data))
  }

  test("decompression bomb hits the output cap as an error value, not OOM") {
    // 64 MiB of zeros gzips to ~64 KiB; cap decoded output at 1 MiB
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    val zeros = new Array[Byte](1 << 20)
    (0 until 64).foreach(_ => gz.write(zeros))
    gz.close()
    val bomb = out.toByteArray
    assert(bomb.length < (1 << 20)) // genuinely a bomb
    val d = HttpDecode.decodeBody(bomb, Some("gzip"), None, maxDecoded = 1 << 20)
    assert(d.failed.contains("max-decoded-length: gzip"))
    assert(d.body.sameElements(bomb)) // input returned untouched
    // same guard on the deflate path
    val defOut = new java.io.ByteArrayOutputStream()
    val df = new java.util.zip.DeflaterOutputStream(defOut)
    (0 until 64).foreach(_ => df.write(zeros))
    df.close()
    val d2 = HttpDecode.decodeBody(defOut.toByteArray, Some("deflate"), None, maxDecoded = 1 << 20)
    assert(d2.failed.contains("max-decoded-length: deflate"))
    // an in-cap body still decodes with the same cap active
    val ok = HttpDecode.decodeBody(gzipped("fits"), Some("gzip"), None, maxDecoded = 1 << 20)
    assert(new String(ok.body) == "fits" && ok.failed.isEmpty)
  }

  test("identity/none are pass-through; corrupt gzip fails soft") {
    val d = HttpDecode.decodeBody("x".getBytes, Some("identity"), None)
    assert(new String(d.body) == "x" && d.failed.isEmpty)
    val corrupt = HttpDecode.decodeBody("nope".getBytes, Some("gzip"), None)
    assert(corrupt.failed.contains("gzip"))
  }
}
