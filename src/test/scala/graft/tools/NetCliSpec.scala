package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The two network CLI commands, driven against a loopback HTTP server
  * (the live endpoints need egress the sandbox does not have — the
  * protocol/parsing/verification logic is what these pin):
  * `encoding download-whatwg-mapping` (resiliparse-py/resiliparse/
  * cli.py:67-96) and `lang download-wiki-dumps` (cli.py:190-236).
  */
class NetCliSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // WHATWG encodings.json subset: a plain group, the iso-8859-8-i
    // logical variant, and a codec the JVM cannot resolve (the WHATWG
    // "replacement" pseudo-encoding — the reference's LookupError path)
    val encodingsJson =
      """[
        |  {"heading": "Legacy", "encodings": [
        |    {"labels": ["cp1252", "latin1", "windows-1252"], "name": "windows-1252"},
        |    {"labels": ["iso-8859-8-i", "logical"], "name": "ISO-8859-8-I"},
        |    {"labels": ["replacement"], "name": "replacement"}
        |  ]},
        |  {"heading": "UTF", "encodings": [
        |    {"labels": ["unicode-1-1-utf-8", "utf-8", "utf8"], "name": "UTF-8"}
        |  ]}
        |]""".stripMargin.getBytes("UTF-8")
    server.createContext("/encodings.json",
      (ex: HttpExchange) => respond(ex, 200, encodingsJson))

    // wiki dump fixtures: one healthy language, one whose dump bytes do
    // not match the advertised md5, one whose status endpoint 404s
    val goodDump = ("<mediawiki>" + ("x" * 5000) + "</mediawiki>").getBytes("UTF-8")
    val goodMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(goodDump).map(b => f"$b%02x").mkString
    def status(url: String, md5: String, size: Int) =
      s"""{"jobs": {"articlesmultistreamdump": {"status": "done", "files": {
         |  "part1.xml.bz2": {"url": "$url", "md5": "$md5", "size": $size}
         |}}}}""".stripMargin.getBytes("UTF-8")
    server.createContext("/enwiki/20260801/dumpstatus.json",
      (ex: HttpExchange) => respond(ex, 200,
        status("/enwiki/20260801/part1.xml.bz2", goodMd5, goodDump.length)))
    server.createContext("/enwiki/20260801/part1.xml.bz2",
      (ex: HttpExchange) => respond(ex, 200, goodDump))
    server.createContext("/dewiki/20260801/dumpstatus.json",
      (ex: HttpExchange) => respond(ex, 200,
        status("/dewiki/20260801/part1.xml.bz2",
          "00000000000000000000000000000000", goodDump.length)))
    server.createContext("/dewiki/20260801/part1.xml.bz2",
      (ex: HttpExchange) => respond(ex, 200, goodDump))
    server.createContext("/xxwiki/20260801/dumpstatus.json",
      (ex: HttpExchange) => respond(ex, 404, Array.emptyByteArray))
    // a language whose status lacks the multistream job: silently skipped
    server.createContext("/nowiki/20260801/dumpstatus.json",
      (ex: HttpExchange) => respond(ex, 200,
        """{"jobs": {"xmlstubsdump": {"status": "done"}}}""".getBytes("UTF-8")))

    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def runCli(args: String*): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val rc = Cli.run(args.toArray, new PrintStream(bos, true, "UTF-8"))
    (rc, bos.toString("UTF-8"))
  }

  test("encoding download-whatwg-mapping: labels canonicalize through the " +
      "platform registry, the iso-8859-8-i variant collapses, unknown " +
      "codecs are skipped with a note") {
    val (rc, outStr) = runCli("encoding", "download-whatwg-mapping",
      s"--url=$base/encodings.json")
    assert(rc == 0, outStr)
    val mapping = outStr.linesIterator.filter(_.contains("\t"))
      .map { l => val Array(a, b) = l.split("\t"); a -> b }.toMap
    assert(mapping("utf8") == "utf-8")
    assert(mapping("unicode-1-1-utf-8") == "utf-8")
    assert(mapping("cp1252") == "windows-1252")
    assert(mapping("latin1") == "windows-1252")
    // the logical variant and its labels ride iso-8859-8
    assert(mapping("iso-8859-8-i") == "iso-8859-8")
    assert(mapping("logical") == "iso-8859-8")
    assert(mapping("iso-8859-8") == "iso-8859-8")
    assert(outStr.contains("skipped replacement"))
    assert(!mapping.contains("replacement"))
  }

  test("encoding download-whatwg-mapping --check: the served subset " +
      "agrees with the shipped WHATWG table (zero drift)") {
    val (rc, outStr) = runCli("encoding", "download-whatwg-mapping",
      s"--url=$base/encodings.json", "--check")
    assert(outStr.contains("0 drift entries"), outStr)
    assert(rc == 0, outStr)
  }

  test("lang download-wiki-dumps: verified download lands, corrupt md5 is " +
      "deleted with a note, HTTP errors are reported per language and the " +
      "rest proceed") {
    val outdir = java.nio.file.Files.createTempDirectory("wikidumps").toFile
    val (rc, outStr) = runCli("lang", "download-wiki-dumps", "20260801",
      "--langs=en,de,xx,no", s"--outdir=${outdir.getPath}", "--jobs=2",
      s"--base-url=$base")
    assert(rc == 0, outStr)
    val en = new java.io.File(outdir, "enwiki.bz2")
    assert(en.isFile && en.length() > 5000, outStr)
    assert(!new java.io.File(outdir, "dewiki.bz2").exists(),
      s"corrupt download must be deleted: $outStr")
    assert(outStr.contains("\"dewiki.bz2\" corrupted"), outStr)
    assert(outStr.contains("Error downloading xxwiki"), outStr)
    // nowiki has no multistream job: skipped without noise or a file
    assert(!new java.io.File(outdir, "nowiki.bz2").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(outdir)
  }
}
