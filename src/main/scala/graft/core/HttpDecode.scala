package graft.core

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, Inflater, InflaterInputStream}
import scala.util.Try
import scala.util.control.NonFatal

/** HTTP payload decoding: chunked transfer decoding
  * (resiliparse-py/resiliparse/parse/http.pyx:28-63) and the
  * Content-/Transfer-Encoding decode chain applied in reverse order
  * (fastwarc-py/fastwarc/warc.pyx:785-837), including Brotli via the
  * from-scratch [[Brotli]] decoder.
  *
  * All entry points are total: on malformed input they return the bytes
  * decoded so far (or the input unchanged) rather than throwing — a
  * corrupt payload must not fail a task.
  */
object HttpDecode {

  /** Parse `Content-Encoding` / `Transfer-Encoding` header values into
    * the encoding chain (comma-separated, outermost last).
    */
  def encodingChain(contentEncoding: Option[String], transferEncoding: Option[String]): Seq[String] =
    (contentEncoding.toSeq ++ transferEncoding.toSeq)
      .flatMap(_.split(',')).map(_.trim.toLowerCase).filter(_.nonEmpty)

  /** Decode a chunked transfer body: `hexsize CRLF chunk CRLF` until a
    * zero-size chunk. Returns None if the input is not parseable as
    * chunked (caller keeps raw bytes).
    */
  def dechunk(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(data.length, 1 << 20))
    var pos = 0
    while (true) {
      val eol = indexOf(data, '\n'.toByte, pos)
      if (eol < 0) return None
      val line = new String(data, pos, eol - pos, StandardCharsets.US_ASCII).trim
      // chunk extensions after ';' are legal; size is the hex prefix
      val sizeStr = line.takeWhile(c => Character.digit(c, 16) >= 0)
      if (sizeStr.isEmpty) return None
      val size = Try(java.lang.Long.parseLong(sizeStr, 16)).getOrElse(return None)
      pos = eol + 1
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (pos + size > data.length) { // truncated: emit what we have
        out.write(data, pos, data.length - pos)
        return Some(out.toByteArray)
      }
      out.write(data, pos, size.toInt)
      pos += size.toInt
      // consume the CRLF after the chunk
      if (pos < data.length && data(pos) == '\r') pos += 1
      if (pos < data.length && data(pos) == '\n') pos += 1
    }
    None // unreachable
  }

  private def indexOf(data: Array[Byte], b: Byte, from: Int): Int = {
    var i = from
    while (i < data.length) { if (data(i) == b) return i; i += 1 }
    -1
  }

  /** MemGuard analog (reference process_guard.pyx:184-533 doctrine): a
    * decompression bomb must surface as an error value, never an executor
    * OOM. Default cap: 1 GiB of decoded output per body.
    */
  val DefaultMaxDecoded: Long = 1L << 30

  /** Thrown internally when decoded output exceeds the cap. */
  private final class DecodedTooLarge extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def readAll(in: java.io.InputStream, maxBytes: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var total = 0L
    var n = in.read(buf)
    while (n > 0) {
      total += n
      if (total > maxBytes) throw new DecodedTooLarge
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def gunzipE(data: Array[Byte], maxBytes: Long): Either[String, Array[Byte]] =
    try Right(readAll(new GZIPInputStream(new ByteArrayInputStream(data)), maxBytes))
    catch {
      case _: DecodedTooLarge => Left("max-decoded-length: gzip")
      case NonFatal(_) => Left("gzip")
    }

  /** deflate — zlib-wrapped per RFC, but many servers send raw deflate:
    * try zlib first, then raw (the tolerance every browser implements).
    */
  private def inflateE(data: Array[Byte], maxBytes: Long): Either[String, Array[Byte]] =
    try Right(readAll(new InflaterInputStream(new ByteArrayInputStream(data), new Inflater(false)), maxBytes))
    catch {
      case _: DecodedTooLarge => Left("max-decoded-length: deflate")
      case NonFatal(_) =>
        try Right(readAll(new InflaterInputStream(new ByteArrayInputStream(data), new Inflater(true)), maxBytes))
        catch {
          case _: DecodedTooLarge => Left("max-decoded-length: deflate")
          case NonFatal(_) => Left("deflate")
        }
    }

  /** gzip / x-gzip member(s), decoded output bounded by `maxBytes`. */
  def gunzip(data: Array[Byte], maxBytes: Long = DefaultMaxDecoded): Option[Array[Byte]] =
    gunzipE(data, maxBytes).toOption

  def inflate(data: Array[Byte], maxBytes: Long = DefaultMaxDecoded): Option[Array[Byte]] =
    inflateE(data, maxBytes).toOption

  /** Decode result: body plus what was (not) applied. */
  final case class Decoded(body: Array[Byte], applied: Seq[String], failed: Option[String])

  /** Apply the encoding chain in reverse (outermost encoding first —
    * warc.pyx:819-837). Unsupported/undecodable steps stop the chain and
    * report the failing encoding; bytes decoded so far are returned.
    * Failure labels are distinct per cause: `max-decoded-length: <enc>`
    * (bomb guard, all codecs including brotli), plain `<enc>` for
    * undecodable input or unsupported codings (`compress`).
    */
  def decodeBody(data: Array[Byte],
      contentEncoding: Option[String], transferEncoding: Option[String],
      maxDecoded: Long = DefaultMaxDecoded): Decoded = {
    val chain = encodingChain(contentEncoding, transferEncoding)
    var cur = data
    var applied = List.empty[String]
    chain.reverseIterator.foreach { enc =>
      val step: Either[String, Array[Byte]] = enc match {
        case "gzip" | "x-gzip" => gunzipE(cur, maxDecoded)
        case "deflate" => inflateE(cur, maxDecoded)
        case "chunked" => dechunk(cur).toRight(enc) // output <= input: no cap needed
        case "identity" | "none" => Right(cur)
        case "br" =>
          try Right(Brotli.decode(cur, maxDecoded))
          catch {
            case e: Brotli.BrotliException if e.getMessage != null &&
                e.getMessage.startsWith("decoded output exceeds") =>
              Left("max-decoded-length: br")
            case NonFatal(_) => Left("br")
          }
        case other => Left(other) // compress, unknown
      }
      step match {
        case Right(next) =>
          cur = next
          if (enc != "identity" && enc != "none") applied ::= enc
        case Left(reason) =>
          return Decoded(cur, applied.reverse, Some(reason))
      }
    }
    Decoded(cur, applied.reverse, None)
  }
}
