package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers over the WARC scan's `headers` array<struct<key,value>>
  * — the ordered multimap (SURVEY §1.4). Pure Catalyst expressions
  * (codegen'd): no UDFs.
  *
  * Lookup semantics mirror the reference (warc.pyx:289-374):
  * [[header]] = LAST occurrence (Python dict-view), [[headerFirst]] =
  * first (Rust get), [[headerAll]] = every value in order.
  */
object WarcCols {

  private def matches(h: Column, name: String): Column =
    lower(h.getField("key")) === name.toLowerCase

  /** All values for a (case-insensitive) header name, in order. */
  def headerAll(headers: Column, name: String): Column =
    transform(filter(headers, h => matches(h, name)), _.getField("value"))

  private def native(headers: Column, name: String, first: Boolean): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.WarcHeaderGet(
        org.apache.spark.sql.GraftColumnBridge.expression(headers),
        name, first))

  /** Last-occurrence lookup (the semantics the reference's tests pin) —
    * a native codegen'd expression (see [[graft.plans.WarcHeaderGet]]).
    */
  def header(headers: Column, name: String): Column =
    native(headers, name, first = false)

  /** First-occurrence lookup (Rust-side `get`). */
  def headerFirst(headers: Column, name: String): Column =
    native(headers, name, first = true)

  def hasHeader(headers: Column, name: String): Column =
    exists(headers, h => matches(h, name))

  /** `","`-concatenated map view (record.rs:602-613). */
  def headerConcat(headers: Column, name: String): Column =
    array_join(headerAll(headers, name), ",")

  def targetUri(headers: Column): Column = header(headers, "WARC-Target-URI")

  /** Request/response pairing key: WARC-Concurrent-To (the equi-join the
    * reference implies via `is_concurrent`, warc.pyx:1336-1344).
    */
  def concurrentTo(headers: Column): Column = header(headers, "WARC-Concurrent-To")

  // — header predicates (warc.pyx:1276-1344) —
  def isWarc10(version: Column): Column = version === "WARC/1.0"
  def isWarc11(version: Column): Column = version === "WARC/1.1"
  def hasBlockDigest(headers: Column): Column = hasHeader(headers, "WARC-Block-Digest")
  def hasPayloadDigest(headers: Column): Column = hasHeader(headers, "WARC-Payload-Digest")
  def isConcurrent(headers: Column): Column = hasHeader(headers, "WARC-Concurrent-To")
}
