package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Multimap laws pinned by the reference's header tests
  * (tests/fastwarc/test_warc.py:622-769): ordered, duplicate keys,
  * case-insensitive lookup, last-occurrence dict-view `get`,
  * first-occurrence Rust `get`, ","-concat map view.
  */
class HeaderMapSpec extends AnyFunSuite {

  private val hm = HeaderMap(Vector(
    "Content-Type" -> "text/html; charset=utf-8",
    "X-Multi" -> "a",
    "x-multi" -> "b",
    "X-MULTI" -> "c"))

  test("get returns LAST occurrence (Cython dict-view semantics)") {
    assert(hm.get("x-multi").contains("c"))
  }

  test("getFirst returns first occurrence (Rust semantics)") {
    assert(hm.getFirst("X-Multi").contains("a"))
  }

  test("getAll preserves insertion order across case variants") {
    assert(hm.getAll("X-MULTI") == Vector("a", "b", "c"))
  }

  test("contains is case-insensitive") {
    assert(hm.contains("content-TYPE"))
    assert(!hm.contains("missing"))
  }

  test("toMapConcat joins duplicates with ',' keeping first key spelling") {
    assert(hm.toMapConcat == Vector(
      "Content-Type" -> "text/html; charset=utf-8", "X-Multi" -> "a,b,c"))
  }

  test("updated replaces last occurrence; append adds") {
    val u = hm.updated("x-multi", "z")
    assert(u.getAll("x-multi") == Vector("a", "b", "z"))
    assert(hm.updated("New-Key", "v").get("new-key").contains("v"))
    assert(hm.append("X-Multi", "d").getAll("x-multi") == Vector("a", "b", "c", "d"))
  }

  test("sanitize strips CR/LF and colons per the write-path rule") {
    assert(HeaderMap.sanitizeKey("Bad:\r\nKey ") == "Bad  Key")
    assert(HeaderMap.sanitizeValue(" v1\r\nv2 ") == "v1  v2")
  }

  test("law: get == getAll.last and getFirst == getAll.head (seeded random)") {
    val rnd = new scala.util.Random(42)
    val keys = Vector("Alpha", "beta", "GAMMA", "delta", "EpSiLoN")
    for (_ <- 1 to 200) {
      val entries = Vector.fill(rnd.nextInt(12))(
        keys(rnd.nextInt(keys.size)) -> rnd.alphanumeric.take(6).mkString)
      val m = HeaderMap(entries)
      keys.foreach { k =>
        val all = m.getAll(k)
        assert(m.get(k) == all.lastOption)
        assert(m.getFirst(k) == all.headOption)
        assert(m.contains(k) == all.nonEmpty)
      }
    }
  }
}
