package graft.core

/** Ordered, case-insensitive multimap of WARC/HTTP headers.
  *
  * Semantics follow the reference's Python-facing behavior (the one its
  * tests pin, see /root/reference/tests/fastwarc/test_warc.py:622-769):
  *  - insertion order is preserved, duplicate keys allowed;
  *  - `get` returns the LAST occurrence (Cython dict-view semantics,
  *    /root/reference/fastwarc-py/fastwarc/warc.pyx:302-314);
  *  - `getFirst` gives the Rust-side first-occurrence lookup
  *    (/root/reference/fastwarc/src/record.rs:376-381);
  *  - `toMapConcat` joins duplicates with "," like record.rs:602-613;
  *  - continuation lines are folded with a single space at parse time
  *    (record.rs:546-555 behavior, implemented in [[WarcParser]]).
  */
final case class HeaderMap(entries: Vector[(String, String)]) {

  @inline private def eq(a: String, b: String): Boolean = a.equalsIgnoreCase(b)

  def get(key: String): Option[String] =
    entries.reverseIterator.collectFirst { case (k, v) if eq(k, key) => v }

  def getFirst(key: String): Option[String] =
    entries.collectFirst { case (k, v) if eq(k, key) => v }

  def getAll(key: String): Vector[String] =
    entries.collect { case (k, v) if eq(k, key) => v }

  def contains(key: String): Boolean = entries.exists { case (k, _) => eq(k, key) }

  /** Duplicate keys concatenated with "," (first key spelling wins). */
  def toMapConcat: Vector[(String, String)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (String, StringBuilder)]
    entries.foreach { case (k, v) =>
      val lk = k.toLowerCase
      out.get(lk) match {
        case Some((_, sb)) => sb.append(',').append(v)
        case None          => out(lk) = (k, new StringBuilder(v))
      }
    }
    out.valuesIterator.map { case (k, sb) => (k, sb.toString) }.toVector
  }

  /** Replace the last occurrence of `key` or append. */
  def updated(key: String, value: String): HeaderMap = {
    val idx = entries.lastIndexWhere { case (k, _) => eq(k, key) }
    if (idx < 0) HeaderMap(entries :+ (key -> value))
    else HeaderMap(entries.updated(idx, (entries(idx)._1, value)))
  }

  def append(key: String, value: String): HeaderMap =
    HeaderMap(entries :+ (key -> value))

  def size: Int = entries.size
  def isEmpty: Boolean = entries.isEmpty
}

object HeaderMap {
  val empty: HeaderMap = HeaderMap(Vector.empty)

  /** Sanitize a header for the write path: CR/LF → space, strip ':' from
    * keys, trim (reference rule record.rs:1521-1529).
    */
  def sanitizeKey(k: String): String =
    k.replace('\r', ' ').replace('\n', ' ').replace(":", "").trim
  def sanitizeValue(v: String): String =
    v.replace('\r', ' ').replace('\n', ' ').trim
}
