package graft.core

/** Fast n-gram language detection — the reference's `detect_fast`
  * (resiliparse-py/resiliparse/parse/lang.pyx:111-175; vectorizer
  * :32-102; FNV-8 hash + out-of-place rank lang.pxd:35-72).
  *
  * A text maps to a 256-dim uint8 frequency vector of FNV-1a-hashed
  * character 1..5-grams over the alpha/space-normalized code points;
  * detection = argmin L1 distance against 101 trained profiles (extracted
  * from the reference's generated lang_profiles.h — data, regenerable via
  * its CLI), with the reference's short-text position bias and rank
  * cutoff.
  */
object LangDetect {

  final val VecSize = 256

  /** (language name, 256-byte profile), in the reference's order — the
    * order matters: the short-text bias adds `min(50, i*3)` by position
    * (Wikipedia-user-count prior, lang.pyx:152-154).
    */
  val profiles: Array[(String, Array[Int])] = {
    val names = {
      val in = getClass.getResourceAsStream("/graft/lang_names.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toArray
      finally in.close()
    }
    val blob = {
      val in = getClass.getResourceAsStream("/graft/lang_profiles.bin")
      try in.readAllBytes() finally in.close()
    }
    require(blob.length == names.length * VecSize, "corrupt lang profile resource")
    names.zipWithIndex.map { case (n, i) =>
      n -> Array.tabulate(VecSize)(j => blob(i * VecSize + j) & 0xff)
    }
  }

  def supportedLangs: Seq[String] = profiles.map(_._1).sorted.toSeq

  /** FNV-1a 32-bit, folded to 8 bits (lang.pxd:35-56). */
  @inline private def fnv8(cps: Array[Int], from: Int, len: Int): Int = {
    var h = 0x811c9dc5 // 2166136261
    var i = 0
    while (i < len) {
      h = h ^ cps(from + i)
      h = h * 16777619
      i += 1
    }
    ((h >>> 8) ^ h) & 0xff
  }

  /** Text -> normalized uint8 n-gram frequency vector (str_to_vec,
    * lang.pyx:32-102): alphabetic code points kept, whitespace runs
    * collapse to a single 0x20, everything else dropped; hash 1..5-grams
    * over the filtered sequence; counts scaled by 256/len, saturated.
    */
  def strToVec(text: String): Array[Int] = {
    val counts = new Array[Int](VecSize)
    // filtered code point ring buffer of the last 5 kept cps
    val window = new Array[Int](5)
    var kept = 0
    var prevSpace = false
    var ci = 0
    val n = text.length
    while (ci < n) {
      val cp = text.codePointAt(ci)
      ci += Character.charCount(cp)
      var keep = -1
      if (Character.isAlphabetic(cp)) { keep = cp; prevSpace = false }
      else if (Character.isWhitespace(cp) || Character.isSpaceChar(cp)) {
        if (!prevSpace) { keep = 0x20; prevSpace = true }
      } else prevSpace = false
      if (keep >= 0) {
        // shift window
        var j = 0
        while (j < 4) { window(j) = window(j + 1); j += 1 }
        window(4) = keep
        counts(fnv8(window, 4, 1)) += 1
        if (kept >= 1) counts(fnv8(window, 3, 2)) += 1
        if (kept >= 2) counts(fnv8(window, 2, 3)) += 1
        if (kept >= 3) counts(fnv8(window, 1, 4)) += 1
        if (kept >= 4) counts(fnv8(window, 0, 5)) += 1
        kept += 1
      }
    }
    val out = new Array[Int](VecSize)
    if (kept > 0) {
      var j = 0
      while (j < VecSize) {
        out(j) = math.min(255L, counts(j).toLong * 256L / kept).toInt
        j += 1
      }
    }
    out
  }

  /** L1 distance (cmp_oop_ranks, lang.pxd:64-72). */
  @inline private def l1(a: Array[Int], b: Array[Int]): Int = {
    var rank = 0
    var i = 0
    while (i < VecSize) {
      rank += math.abs(a(i) - b(i))
      i += 1
    }
    rank
  }

  /** (language, rank); ("unknown", 0) above the cutoff. */
  def detectFast(text: String, cutoff: Int = 1200,
      langs: Option[Set[String]] = None): (String, Int) =
    detectFastWith(profiles, text, cutoff, langs)

  /** detectFast against an explicit profile set — the CLI's
    * retrain→dump→reload loop evaluates freshly trained vectors without
    * swapping the built-in resource (cli.py:446-526 `evaluate`).
    */
  def detectFastWith(profs: Array[(String, Array[Int])], text: String,
      cutoff: Int = 1200, langs: Option[Set[String]] = None): (String, Int) = {
    val vec = strToVec(text)
    val textLen = text.length
    var best: String = null
    var bestRank = Int.MaxValue
    var i = 0
    while (i < profs.length) {
      val (name, profile) = profs(i)
      if (langs.forall(_.contains(name))) {
        var rank = l1(vec, profile)
        if (rank > 500 && textLen < 150) rank += math.min(50, i * 3)
        if (rank <= cutoff && rank < bestRank) { bestRank = rank; best = name }
      }
      i += 1
    }
    if (best == null) ("unknown", 0) else (best, bestRank)
  }

  /** Write a profile set as the loadable binary pair: `lang_names.txt`
    * (one code per line, bias order) + `lang_profiles.bin` (concatenated
    * 256-byte vectors) — the on-disk inverse of the resource loader
    * above, so CLI-retrained vectors round-trip into this detector.
    */
  def writeBinary(vectors: Seq[(String, Array[Int])], dir: java.io.File): Unit = {
    dir.mkdirs()
    val names = new java.io.PrintWriter(new java.io.File(dir, "lang_names.txt"), "UTF-8")
    try vectors.foreach(v => names.println(v._1)) finally names.close()
    val bin = new java.io.FileOutputStream(new java.io.File(dir, "lang_profiles.bin"))
    try vectors.foreach { case (_, vec) =>
      require(vec.length == VecSize, s"vector length ${vec.length} != $VecSize")
      bin.write(vec.map(_.toByte))
    } finally bin.close()
  }

  /** Load a profile set written by [[writeBinary]] (or the shipped
    * resource pair copied to a directory).
    */
  def loadBinary(dir: java.io.File): Array[(String, Array[Int])] = {
    val names = {
      val src = scala.io.Source.fromFile(new java.io.File(dir, "lang_names.txt"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).toArray finally src.close()
    }
    val blob = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "lang_profiles.bin").toPath)
    require(blob.length == names.length * VecSize,
      s"profile blob ${blob.length} bytes != ${names.length} langs * $VecSize")
    names.zipWithIndex.map { case (n, i) =>
      n -> Array.tabulate(VecSize)(j => blob(i * VecSize + j) & 0xff)
    }
  }

  /** Top-k variant (detect_fast with n_results>1). */
  def detectTopK(text: String, k: Int, cutoff: Int = 1200): Seq[(String, Int)] = {
    val vec = strToVec(text)
    val textLen = text.length
    profiles.zipWithIndex.flatMap { case ((name, profile), i) =>
      var rank = l1(vec, profile)
      if (rank > 500 && textLen < 150) rank += math.min(50, i * 3)
      if (rank <= cutoff) Some(name -> rank) else None
    }.sortBy(_._2).take(k).toSeq
  }

  /** Dump trained vectors as a C header (the reference CLI's profile
    * codegen, resiliparse-py/resiliparse/cli.py:397-432) so profiles
    * retrained in Spark round-trip into the reference's build.
    */
  def toCHeader(vectors: Seq[(String, Array[Int])]): String = {
    val sb = new StringBuilder
    sb.append("/* Generated language detection profiles. */\n")
    sb.append("#ifndef GRAFT_LANG_PROFILES_H\n#define GRAFT_LANG_PROFILES_H\n\n")
    sb.append("#include <stdint.h>\n\n")
    sb.append(s"#define LANG_VEC_SIZE $VecSize\n")
    sb.append("typedef const uint8_t lang_vec_t[LANG_VEC_SIZE];\n\n")
    sb.append("typedef struct lang {\n    const char* lang;\n    const lang_vec_t vec;\n} lang_t;\n\n")
    sb.append("static const lang_t LANGS[] = {\n")
    vectors.foreach { case (name, vec) =>
      sb.append(s"""    {"$name", {${vec.mkString(", ")}}},\n""")
    }
    sb.append("};\n\n#endif\n")
    sb.toString
  }

  /** `train_language_examples` (lang.pyx:196-226): elementwise mean of
    * example vectors, saturating u8 — the merge step is associative, so
    * this maps onto a Spark Aggregator (sum + count, finish = divide).
    */
  def trainExamples(examples: Iterable[String]): Array[Int] = {
    val agg = new Array[Long](VecSize)
    var count = 0
    examples.foreach { ex =>
      val v = strToVec(ex)
      var i = 0
      while (i < VecSize) { agg(i) += v(i); i += 1 }
      count += 1
    }
    if (count == 0) new Array[Int](VecSize)
    else Array.tabulate(VecSize)(i => math.min(255L, agg(i) / count).toInt)
  }
}
