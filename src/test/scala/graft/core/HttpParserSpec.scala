package graft.core

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** HTTP message split semantics (reference: warc.pyx:760-783,1028-1087 —
  * Latin-1 headers, status-line derivations warc.pyx:261-287).
  */
class HttpParserSpec extends AnyFunSuite {

  private def msg(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)

  test("splits header block from body at CRLFCRLF") {
    val m = HttpParser.parse(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body</html>")).get
    assert(m.status.contains(200))
    assert(m.reason.contains("OK"))
    assert(new String(m.body, StandardCharsets.ISO_8859_1) == "<html>body</html>")
  }

  test("tolerant LFLF split") {
    val m = HttpParser.parse(msg("HTTP/1.0 404 Not Found\nX: y\n\nbody")).get
    assert(m.status.contains(404))
    assert(m.reason.contains("Not Found"))
    assert(new String(m.body) == "body")
  }

  test("headers decode as Latin-1") {
    val m = HttpParser.parse(msg("HTTP/1.1 200 OK\r\nX-Name: café\r\n\r\n")).get
    assert(m.headers.get("X-Name").contains("café"))
  }

  test("content type strips parameters; charset extracted, quoted ok") {
    val m = HttpParser.parse(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=\"UTF-8\"\r\n\r\n")).get
    assert(m.contentType.contains("text/html"))
    assert(m.charset.contains("utf-8"))
  }

  test("request lines parse as http without a status") {
    val m = HttpParser.parse(msg("GET /path HTTP/1.1\r\nHost: x\r\n\r\n")).get
    assert(m.status.isEmpty)
    assert(m.headers.get("Host").contains("x"))
  }

  test("non-http payload yields None") {
    assert(HttpParser.parse("just some text".getBytes).isEmpty)
    assert(HttpParser.parse(Array.emptyByteArray).isEmpty)
  }

  test("continuation lines fold with a space") {
    val m = HttpParser.parse(msg(
      "HTTP/1.1 200 OK\r\nX-Long: part1\r\n  part2\r\n\r\n")).get
    assert(m.headers.get("X-Long").contains("part1 part2"))
  }
}
