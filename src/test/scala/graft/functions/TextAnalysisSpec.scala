package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge cases for the text-analysis kernels that the synthetic-corpus
  * oracles never exercise (empty/short/whitespace-only documents), plus
  * a cross-check of the compiled Carter-Wegman MinHash against an
  * independent reimplementation of its math.
  */
class TextAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").appName("textanalysis-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def onTexts(texts: Seq[String]) = {
    val ss = spark; import ss.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("kernels never throw on empty/short/whitespace text") {
    val df = onTexts(Seq("", " ", "one", "two words", "a b c d e", "x\n\ny \t z"))
    val out = df.select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.tokenCount(col("text")).as("ntok"),
      TextAnalysis.charNgrams(col("text"), 3).as("grams"),
      TextAnalysis.wordShingles(col("text"), 3).as("shingles"),
      TextAnalysis.minhashShingleSigCW(col("text"), 3, 8).as("sig"),
      TextAnalysis.simhash16Expr("text").as("sh16"))
      .collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getSeq[Long](5).size == 8) // sig always k components
    }
    // short text: single partial shingle
    val shingles = out(3).getSeq[String](4)
    assert(shingles == Seq("two words"))
  }

  test("compiled CW minhash matches an independent reimplementation") {
    def reference(text: String, w: Int, k: Int): Seq[Long] = {
      val toks = text.trim.split("\\s+")
      val shingles = (0 until math.max(toks.length - w + 1, 1))
        .map(i => toks.slice(i, i + w).mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      val perShingle = shingles.map { s =>
        val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        (h1, h2)
      }
      (0 until k).map(i => perShingle.map { case (h1, h2) =>
        (h1 + i * h2) % 4294967311L }.min)
    }
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a b", "single", "repeat repeat repeat repeat")
    val df = onTexts(texts)
    val got = df.select(col("doc_id"),
        TextAnalysis.minhashShingleSigCW(col("text"), 3, 8).as("sig"))
      .orderBy("doc_id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i).getSeq[Long](1) == reference(t, 3, 8), t)
    }
  }

  test("compiled simhash64 kernel is bit-identical to the SQL construction") {
    // the DuckDB oracle reproduces the counts+hex SQL form; the compiled
    // kernel must never drift from it
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "", "  ", "Ein zwei drei vier fünf",
      "repeated repeated repeated tokens tokens",
      (1 to 200).map(i => s"tok$i").mkString(" "),
      // non-space edge whitespace: SQL trim strips SPACES only and split
      // keeps the resulting leading/trailing empty tokens — the kernel
      // must tokenize identically (java's trim/split defaults do not)
      "hello\n", "\thello", "\n\nhello world\t\n", " \t spaced \n ",
      "a\nb\tc\r\nd")
    val df = onTexts(texts)
    val both = df
      .withColumn("cnt", TextAnalysis.simhash64Counts("text"))
      .select(
        TextAnalysis.simhash64Hex("cnt").as("sql_form"),
        TextAnalysis.simhash64(col("text")).as("kernel"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("lsh bands derive from consecutive signature components") {
    val ss = spark; import ss.implicits._
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L))).toDF("sig")
    val bands = df.select(TextAnalysis.lshBands(col("sig"), 2, 2).as("b"))
      .head.getSeq[String](0)
    assert(bands.size == 2)
    assert(bands.distinct.size == 2)
    // same sig -> same band keys (deterministic md5 of "1|2", "3|4")
    val again = df.select(TextAnalysis.lshBands(col("sig"), 2, 2).as("b"))
      .head.getSeq[String](0)
    assert(bands == again)
  }

  test("identical documents share full signatures; different ones do not") {
    val df = onTexts(Seq(
      "shared text body for near duplicate detection purposes",
      "shared text body for near duplicate detection purposes",
      "completely different content with other words entirely"))
    val sigs = df.select(TextAnalysis.minhashShingleSigCW(col("text"), 3, 8).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash16 kernel == simhash16Expr SQL form") {
    val texts = Seq(
      "the quick brown fox", "single", "a a a a a a",
      (1 to 200).map(i => s"tok$i").mkString(" "),
      "hello\n", "\thello", "\n\nhello world\t\n", " \t spaced \n ")
    val df = onTexts(texts)
    val rows = df.select(
      TextAnalysis.simhash16(col("text")).as("kernel"),
      TextAnalysis.simhash16Expr("text").as("sql_form")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("wordShingleSet kernel == array_distinct(wordShingles) HOF form") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again the quick brown fox",
      "short",
      "a b c d",                    // fewer tokens than w -> one partial shingle
      " leading and trailing  ",    // SQL trim/split edge semantics
      "dup dup dup dup dup dup dup dup")
    val df = onTexts(texts)
    val rows = df.select(
      TextAnalysis.wordShingleSet(5)(col("text")).as("kernel"),
      array_distinct(TextAnalysis.wordShingles(col("text"), 5)).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("winnowing: rolling kernel matches naive gram hashes + window minima") {
    // naive reference: recompute every k-gram hash from scratch, take
    // min per window, distinct — the construction the oracle SQL uses
    def naive(n: String, k: Int, w: Int): (Long, Long, Option[Long]) = {
      val B = 257L; val M = 1000000007L
      if (n.length < k) (0L, 0L, None)
      else {
        val hs = (0 to n.length - k).map { i =>
          n.substring(i, i + k).foldLeft(0L)((h, c) => (h * B + c) % M)
        }
        val fps = (0 until math.max(hs.length - w + 1, 1))
          .map(i => hs.slice(i, i + w).min).distinct
        (hs.length.toLong, fps.length.toLong, Some(fps.sum))
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa",            // degenerate: all grams equal
      "abcd",                        // shorter than k -> no grams
      "abcdef",                      // fewer grams than w -> one window
      "Mixed CASE with Punctuation!!! and   runs   of spaces 123")
    val df = onTexts(texts)
    val got = df.select(
      TextAnalysis.winnowNorm(col("text")).as("n"),
      TextAnalysis.winnowFingerprint(5, 4)(TextAnalysis.winnowNorm(col("text"))).as("fp"))
      .collect()
    got.foreach { r =>
      val (nGrams, nFps, fpSum) = naive(r.getString(0), 5, 4)
      val fp = r.getStruct(1)
      assert(fp.getLong(0) == nGrams, s"n_grams for '${r.getString(0)}'")
      assert(fp.getLong(1) == nFps, s"n_fps for '${r.getString(0)}'")
      assert((if (fp.isNullAt(4)) None else Some(fp.getLong(4))) == fpSum,
        s"fp_sum for '${r.getString(0)}'")
    }
  }

  test("charNgramSet kernel == array_distinct(charNgrams) HOF form") {
    val texts = Seq(
      "the quick brown fox", "aaaaaaaa", "ab", "abc",
      "Mixed CASE & punctuation!!! with   spaces")
    val df = onTexts(texts)
    val got = df.select(
      org.apache.spark.sql.functions.array_distinct(
        TextAnalysis.charNgrams(col("text"), 3)).as("hof"),
      TextAnalysis.charNgramSet(3)(col("text")).as("kernel"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("winnowFingerprintSet agrees with winnowFingerprint stats") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "abcd", "abcdef",
      "Mixed CASE with Punctuation!!! and   runs   of spaces 123")
    val df = onTexts(texts)
    val got = df.select(
      TextAnalysis.winnowFingerprint(5, 4)(TextAnalysis.winnowNorm(col("text"))).as("fp"),
      TextAnalysis.winnowFingerprintSet(5, 4)(TextAnalysis.winnowNorm(col("text"))).as("set"))
      .collect()
    got.foreach { r =>
      val fp = r.getStruct(0)
      val set = r.getSeq[Long](1)
      assert(set.length.toLong == fp.getLong(1)) // n_fps
      assert(set == set.sorted && set.distinct == set)
      if (set.nonEmpty) {
        assert(set.head == fp.getLong(2) && set.last == fp.getLong(3)) // min, max
        assert(set.sum == fp.getLong(4))
      }
    }
  }

  test("kernels match reference forms on 150 random texts (fixed seed)") {
    // seeded fuzz across the compiled kernels and their slow reference
    // renditions: random lengths, alphabets including digits/punct/
    // unicode/edge whitespace — the space the deterministic cases above
    // can't enumerate
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabets = Array(
      "abcdefgh ",
      "ab 12.,! ",
      "the of and a is to in x y z ",
      "日本語中文한국어 ",
      " \t\nabc\r")
    val texts = (0 until 150).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      val n = rnd.nextInt(400)
      (0 until n).map(_ => a.charAt(rnd.nextInt(a.length))).mkString
    }
    val df = onTexts(texts)
    // winnowing vs naive recompute
    def naiveWin(n: String, k: Int, w: Int): (Long, Long) = {
      val B = 257L; val M = 1000000007L
      if (n.length < k) (0L, 0L)
      else {
        val hs = (0 to n.length - k).map { i =>
          n.substring(i, i + k).foldLeft(0L)((h, c) => (h * B + c) % M)
        }
        val fps = (0 until math.max(hs.length - w + 1, 1))
          .map(i => hs.slice(i, i + w).min).distinct
        (hs.length.toLong, fps.length.toLong)
      }
    }
    val rows = df.select(
      TextAnalysis.winnowNorm(col("text")).as("n"),
      TextAnalysis.winnowFingerprint(5, 4)(TextAnalysis.winnowNorm(col("text"))).as("fp"),
      TextAnalysis.simhash16(col("text")).as("sh_kernel"),
      TextAnalysis.simhash16Expr("text").as("sh_sql"),
      TextAnalysis.wordShingleSet(3)(col("text")).as("shs_kernel"),
      array_distinct(TextAnalysis.wordShingles(col("text"), 3)).as("shs_hof")).collect()
    rows.foreach { r =>
      val (ng, nf) = naiveWin(r.getString(0), 5, 4)
      assert(r.getStruct(1).getLong(0) == ng && r.getStruct(1).getLong(1) == nf,
        s"winnow mismatch on '${r.getString(0).take(60)}'")
      assert(r.getLong(2) == r.getLong(3), "simhash16 kernel != SQL form")
      assert(r.getSeq[String](4) == r.getSeq[String](5), "shingle kernel != HOF")
    }
  }

  test("winnowing: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "identicalsequencehere"  // 21 chars >= 5+4-1
    val df = onTexts(Seq(s"prefix one $shared suffix alpha",
                         s"other beginning $shared different end"))
    val sel = df.select(
      TextAnalysis.winnowFingerprint(5, 4)(TextAnalysis.winnowNorm(col("text"))).as("fp"))
    // no direct fps-set output column; re-derive via distinct minima
    // equality on the guarantee's strongest observable: both docs must
    // produce at least one equal selected hash, which with these inputs
    // shows up as overlapping [fp_min, fp_max] ranges and equal mins of
    // the shared run. Weak proxy, so ALSO check via the naive set:
    def fpSet(n: String, k: Int = 5, w: Int = 4): Set[Long] = {
      val B = 257L; val M = 1000000007L
      if (n.length < k) Set.empty
      else {
        val hs = (0 to n.length - k).map { i =>
          n.substring(i, i + k).foldLeft(0L)((h, c) => (h * B + c) % M)
        }
        (0 until math.max(hs.length - w + 1, 1)).map(i => hs.slice(i, i + w).min).toSet
      }
    }
    val norms = df.select(TextAnalysis.winnowNorm(col("text"))).collect().map(_.getString(0))
    assert(fpSet(norms(0)).intersect(fpSet(norms(1))).nonEmpty)
    assert(sel.count() == 2)
  }

  test("t33 Aho-Corasick differential fuzz: 2000 random (patterns, text) " +
    "pairs over a 3-char alphabet match the brute-force replace counts") {
    // tiny alphabet forces dense pattern overlap: shared prefixes,
    // proper-suffix fail links, self-overlapping patterns
    val rnd = new scala.util.Random(0x533d33)
    def randStr(maxLen: Int): String = {
      val n = 1 + rnd.nextInt(maxLen)
      String.valueOf(Array.fill(n)(('a' + rnd.nextInt(3)).toChar))
    }
    // brute force: greedy leftmost non-overlap per pattern = what
    // String.replace removes
    def brute(text: String, p: String): Long = {
      var c = 0L; var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + p.length) }
      c
    }
    var iter = 0
    while (iter < 2000) {
      val pats = Seq.fill(1 + rnd.nextInt(6))(randStr(5)).distinct.toArray
      val ac = new graft.plans.AhoCorasick(pats)
      val text = randStr(60)
      val got = ac.counts(
        org.apache.spark.unsafe.types.UTF8String.fromString(text)).toLongArray()
      val want = pats.map(brute(text, _))
      assert(got.toSeq == want.toSeq,
        s"iter $iter: text=$text pats=${pats.mkString("[", ",", "]")}")
      iter += 1
    }
  }

  test("blocklist: in-place UTF-8 walk matches String-walk counts on " +
      "multi-byte, surrogate-pair, and mixed text") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(0xdec0de)
    val alphabet: Array[String] =
      Array("a", "b", "é", "ß", "中", "文", "🦊", "𐍈", " ")
    def randStr(maxUnits: Int): String = {
      val sb = new StringBuilder
      while (sb.length < 1 + rnd.nextInt(maxUnits))
        sb.append(alphabet(rnd.nextInt(alphabet.length)))
      sb.toString
    }
    def brute(text: String, p: String): Long = {
      var c = 0L; var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + p.length) }
      c
    }
    var iter = 0
    while (iter < 1000) {
      val pats = Seq.fill(1 + rnd.nextInt(5))(randStr(6)).distinct.toArray
      val ac = new graft.plans.AhoCorasick(pats)
      val text = randStr(80)
      val got = ac.counts(UTF8String.fromString(text)).toLongArray()
      val want = pats.map(brute(text, _))
      assert(got.toSeq == want.toSeq,
        s"iter $iter: text=$text pats=${pats.mkString("[", ",", "]")}")
      iter += 1
    }
  }

  test("blocklist: arbitrary INVALID bytes (overlong, stray continuation, " +
      "truncated leads, surrogates) count like the String-decoded walk") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(0xbadb17e5L.toInt)
    def brute(text: String, p: String): Long = {
      var c = 0L; var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + p.length) }
      c
    }
    // patterns include the replacement char Java substitutes for damage
    val pats = Array("ab", "�", "��", "a�b", "é")
    val ac = new graft.plans.AhoCorasick(pats)
    // hand-picked malformed shapes + random byte soup
    val fixed = Seq[Array[Byte]](
      Array(0xc0, 0x80).map(_.toByte),             // overlong NUL
      Array(0xe0, 0x80, 0x80).map(_.toByte),       // overlong 3-byte
      Array(0xed, 0xa0, 0x80).map(_.toByte),       // CESU surrogate
      Array(0xf4, 0x90, 0x80, 0x80).map(_.toByte), // > U+10FFFF
      Array('a'.toByte, 0x80.toByte, 'b'.toByte),  // stray continuation
      Array('a'.toByte, 0xc3.toByte))              // truncated lead at end...
    val cases = fixed ++ (0 until 500).map { _ =>
      val b = new Array[Byte](1 + rnd.nextInt(40))
      rnd.nextBytes(b)
      b
    }
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val u = UTF8String.fromBytes(bytes)
      val got = ac.counts(u).toLongArray().toSeq
      val want = pats.map(brute(u.toString, _)).toSeq
      assert(got == want,
        s"case $i bytes=${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    }
  }

  test("blocklistCounts with an empty or blank pattern list fails at analysis time") {
    val s = spark
    import s.implicits._
    val df = Seq("some text").toDF("text")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.TextAnalysis.blocklistCounts(
        org.apache.spark.sql.functions.col("text"), Seq.empty)).schema
    }
    assert(e1.getMessage.contains("non-empty"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.TextAnalysis.blocklistCounts(
        org.apache.spark.sql.functions.col("text"), Seq("ok", ""))).schema
    }
    assert(e2.getMessage.contains("non-empty"))
  }

  /** Adversarial texts for the r17 compiled kernels: whitespace edges,
    * punctuation-only tokens, multi-byte BMP chars, and a supplementary-
    * plane emoji (two UTF-16 units, ONE Spark code point) — the case
    * that breaks any char-indexed reimplementation of substring.
    */
  private val r17Texts = Seq(
    "", " ", "  ", "one", "two words", " lead", "trail ", "a  b   c",
    "Hello, World! 123 foo-bar", "ALL CAPS and lower",
    "café déjà vu", "emoji 😀 mid word",
    "😀starts with emoji", "tab\tand\nnewline mix",
    "punct..." * 3, "x " * 40 + "repeated span " * 5 + "tail")

  test("r17 bpeNormToken/bpeMarkWord kernels == regex forms") {
    val df = onTexts(r17Texts)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val rows = df.select(
        TextAnalysis.bpeNormToken(col("tok")).as("k_w"),
        lower(regexp_replace(col("tok"), "[^A-Za-z]", "")).as("h_w"))
      .withColumn("k_syms", TextAnalysis.bpeMarkWord(col("k_w")))
      .withColumn("h_syms", regexp_replace(col("h_w"), "(.)", "<$1>"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"norm: $r")
      assert(r.getString(2) == r.getString(3), s"mark: $r")
    }
  }

  test("r17 bigramPairs kernel == zip_with(slice, slice) HOF form") {
    val df = onTexts(r17Texts)
    val k = df.select(col("doc_id"),
        explode(TextAnalysis.bigramPairs(col("text"))).as("p"))
      .select(col("doc_id"), col("p._1").as("w1"), col("p._2").as("w2"))
    val tk = df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    val h = tk.select(col("doc_id"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    assert(k.exceptAll(h).isEmpty && h.exceptAll(k).isEmpty)
    assert(k.count() == h.count())
  }

  test("r18 tokenCounts kernel == groupBy over explode(split(trim)) " +
    "expression form, incl. empty/whitespace/\\t-edge token quirks") {
    val df = onTexts(r17Texts :+ "\tleading tab" :+ "trailing tab\t" :+
      "\t" :+ "\f\r mixed " :+ null)
    // kernel rows (doc_id, tok, n)
    val k = df.select(col("doc_id"),
        explode(TextAnalysis.tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc._1").as("tok"), col("tc._2").as("n"))
    // the ORIGINAL expression chain, verbatim
    val h = df.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
    assert(k.exceptAll(h).isEmpty && h.exceptAll(k).isEmpty)
    assert(k.count() == h.count())
    // null text -> zero rows on both sides (explode drops null arrays)
    val nullRows = df.filter(col("text").isNull).select(col("doc_id"))
    assert(k.join(nullRows, "doc_id").count() == 0)
  }

  test("r17 wordStartWindows kernel == per-character explode/filter/substring form") {
    for ((win, fullOnly) <- Seq((40, true), (64, false), (5, true), (5, false))) {
      val df = onTexts(r17Texts)
      val k = df.select(col("doc_id"),
          explode(TextAnalysis.wordStartWindows(win, fullOnly)(col("text"))).as("x"))
        .select(col("doc_id"), col("x._1").as("p"), col("x._2").as("w"))
      val base = df.select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")))).as("p"))
        .filter((col("p") === 1 || expr("substring(text, p - 1, 1)") === " ") &&
          expr("substring(text, p, 1)") =!= " ")
      val h0 = if (fullOnly) base.filter(col("p") + win <= length(col("text")) + 1)
        else base
      val h = h0.select(col("doc_id"), col("p"),
        expr(s"substring(text, p, $win)").as("w"))
      assert(k.exceptAll(h).isEmpty && h.exceptAll(k).isEmpty,
        s"win=$win fullOnly=$fullOnly")
      assert(k.count() == h.count(), s"count win=$win fullOnly=$fullOnly")
    }
  }
}
