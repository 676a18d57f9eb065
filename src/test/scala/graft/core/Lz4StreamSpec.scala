package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileInputStream}

/** The from-scratch LZ4 frame decoder against reference streams:
  * byte-identical to commons-compress on the dependent-block fixtures,
  * and round-trips what our own frame writer produces.
  */
class Lz4StreamSpec extends AnyFunSuite {

  private def drain(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](32 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def commonsDecode(bytes: Array[Byte]): Array[Byte] =
    drain(new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(
      new ByteArrayInputStream(bytes), true))

  private val fixtures = Seq(
    "/root/reference/tests/data/warcfile.warc.lz4",
    "/root/reference/tests/data/block-sized-records.warc.lz4")

  test("byte-identical to commons-compress on dependent-block fixtures") {
    for (f <- fixtures) {
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      val ours = drain(new Lz4FrameInputStream(new ByteArrayInputStream(raw)))
      val theirs = commonsDecode(raw)
      assert(ours.length == theirs.length, s"$f length")
      assert(java.util.Arrays.equals(ours, theirs), s"$f content")
    }
  }

  test("concatenated frames decode as one stream") {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtures.head))
    val doubled = raw ++ raw
    val ours = drain(new Lz4FrameInputStream(new ByteArrayInputStream(doubled)))
    val one = commonsDecode(raw)
    assert(ours.length == 2 * one.length)
    assert(java.util.Arrays.equals(ours.take(one.length), one))
    assert(java.util.Arrays.equals(ours.drop(one.length), one))
  }

  test("round-trips our own writer's frames (independent blocks)") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/data/warcfile.warc.gz"))
    val recompressed = new ByteArrayOutputStream()
    WarcWriter.recompress(new ByteArrayInputStream(src), recompressed, WarcWriter.Lz4)
    val bytes = recompressed.toByteArray
    val ours = drain(new Lz4FrameInputStream(new ByteArrayInputStream(bytes)))
    val theirs = commonsDecode(bytes)
    assert(java.util.Arrays.equals(ours, theirs))
  }

  test("skippable frames are skipped") {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtures.head))
    val skippable = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val ours = drain(new Lz4FrameInputStream(
      new ByteArrayInputStream(skippable ++ raw)))
    assert(java.util.Arrays.equals(ours, commonsDecode(raw)))
  }

  test("WarcCodecs.open routes lz4 through the native decoder") {
    val (in, codec) = WarcCodecs.open(new FileInputStream(fixtures.head))
    try {
      assert(codec == WarcCodecs.Lz4)
      assert(in.isInstanceOf[Lz4FrameInputStream])
    } finally in.close()
  }

  test("round-trips every writer flag combination (property)") {
    import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream
    import FramedLZ4CompressorOutputStream.{BlockSize, Parameters}
    val rnd = new scala.util.Random(42)
    // payload mix: high-entropy, highly repetitive (long matches,
    // cross-block back-references under dependency), and empty
    val payloads = Seq(
      Array.emptyByteArray,
      Array.fill(100)(rnd.nextInt().toByte),
      Array.fill(300 * 1024)(rnd.nextInt().toByte),
      ("abcdefgh" * (100 * 1024)).getBytes, // 800 KB of period-8 text
      (0 until 200 * 1024).map(i => (i % 7).toByte).toArray)
    for {
      payload <- payloads
      bs <- Seq(BlockSize.K64, BlockSize.M1)
      contentCk <- Seq(true, false)
      blockCk <- Seq(true, false)
      dependent <- Seq(true, false)
    } {
      val out = new ByteArrayOutputStream()
      val w = new FramedLZ4CompressorOutputStream(out,
        new Parameters(bs, contentCk, blockCk, dependent))
      w.write(payload); w.close()
      val ours = drain(new Lz4FrameInputStream(
        new ByteArrayInputStream(out.toByteArray)))
      assert(java.util.Arrays.equals(ours, payload),
        s"len=${payload.length} bs=$bs cck=$contentCk bck=$blockCk dep=$dependent")
    }
  }

  test("corrupted block surfaces IOException, not garbage") {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtures.head)).clone()
    // flip bytes inside the first data block (past the 7-byte header)
    raw(40) = (raw(40) ^ 0xff).toByte
    raw(41) = (raw(41) ^ 0xff).toByte
    intercept[java.io.IOException] {
      drain(new Lz4FrameInputStream(new ByteArrayInputStream(raw)))
    }
  }
}
