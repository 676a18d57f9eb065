package graft.core

import java.time.Instant

/** WARC record types as a bitmask enum for cheap pushed-down filters
  * (reference: /root/reference/fastwarc/src/record.rs:36-49).
  */
object RecordType {
  val Warcinfo     = 2
  val Response     = 4
  val Resource     = 8
  val Request      = 16
  val Metadata     = 32
  val Revisit      = 64
  val Conversion   = 128
  val Continuation = 256
  val Unknown      = 512
  val AnyType      = 65535
  val NoType       = 0

  private val byName: Map[String, Int] = Map(
    "warcinfo" -> Warcinfo, "response" -> Response, "resource" -> Resource,
    "request" -> Request, "metadata" -> Metadata, "revisit" -> Revisit,
    "conversion" -> Conversion, "continuation" -> Continuation)

  def mask(name: String): Int = byName.getOrElse(name.toLowerCase, Unknown)

  def maskOf(names: Iterable[String]): Int =
    names.foldLeft(0)((m, n) => m | mask(n))

  def matches(recordMask: Int, filterMask: Int): Boolean =
    (recordMask & filterMask) != 0
}

/** Parsed HTTP message view over a record payload. Headers are Latin-1
  * decoded (reference: warc.pyx:775); body is the remaining bytes.
  */
final case class HttpMessage(
    statusLine: String,
    status: Option[Int],
    reason: Option[String],
    headers: HeaderMap,
    body: Array[Byte]) {

  /** Media type from Content-Type, lowercased, parameters stripped. */
  def contentType: Option[String] =
    headers.get("Content-Type").map { ct =>
      val semi = ct.indexOf(';')
      (if (semi >= 0) ct.substring(0, semi) else ct).trim.toLowerCase
    }.filter(_.nonEmpty)

  /** charset= parameter of Content-Type, lowercased, quotes stripped. */
  def charset: Option[String] =
    headers.get("Content-Type").flatMap { ct =>
      val m = HttpMessage.CharsetRe.findFirstMatchIn(ct)
      m.map(_.group(1).trim.stripPrefix("\"").stripSuffix("\"").toLowerCase)
        .filter(_.nonEmpty)
    }
}

object HttpMessage {
  private val CharsetRe = """(?i)charset\s*=\s*("[^"]*"|[^;\s]*)""".r
}

/** A fully materialized ("frozen", in reference terms — warc.pyx:980-998)
  * WARC record. Spark rows are always frozen; laziness is replaced by
  * column pruning + scan options.
  *
  * @param content the full record block (for HTTP records this INCLUDES
  *                the HTTP header bytes; `http.map(_.body)` is the payload)
  * @param length  total serialized record length in the stream, including
  *                WARC headers and trailing CRLFs, when known
  */
final case class WarcRecord(
    filename: String,
    offset: Long,
    length: Long,
    recordId: Option[String],
    recordType: String,
    recordTypeMask: Int,
    recordDate: Option[Instant],
    contentLength: Long,
    headers: HeaderMap,
    content: Array[Byte],
    http: Option[HttpMessage],
    error: Option[String] = None,
    /** The record's version line, e.g. "WARC/1.0" (warc.pyx:1276-1290). */
    version: String = "") {

  def isHttp: Boolean = http.isDefined

  def isWarc10: Boolean = version == "WARC/1.0"
  def isWarc11: Boolean = version == "WARC/1.1"
  def hasBlockDigest: Boolean = headers.contains("WARC-Block-Digest")
  def hasPayloadDigest: Boolean = headers.contains("WARC-Payload-Digest")
  /** Has a WARC-Concurrent-To link (request<->response pairing,
    * warc.pyx:1336-1344).
    */
  def isConcurrent: Boolean = headers.contains("WARC-Concurrent-To")

  def targetUri: Option[String] = headers.get("WARC-Target-URI")

  def blockDigestOk: Option[Boolean] =
    headers.get("WARC-Block-Digest").map(Digests.verify(_, content))

  /** None when unverifiable: no digest header, or the payload is HTTP but
    * was not isolated (parse_http off / no split found) — verifying the
    * digest against bytes that still include the HTTP header would yield
    * a spurious verdict (reference: verify_payload_digest returns False
    * only for a real mismatch of the isolated payload, warc.pyx:1000-1024).
    */
  def payloadDigestOk: Option[Boolean] =
    headers.get("WARC-Payload-Digest").flatMap { d =>
      http match {
        case Some(m) => Some(Digests.verify(d, m.body))
        case None =>
          val isHttpCt = headers.get("Content-Type")
            .exists(_.trim.toLowerCase.startsWith("application/http"))
          if (isHttpCt) None // HTTP payload not isolated -> unverifiable
          else Some(Digests.verify(d, content))
      }
    }
}
