package graft.tools

import graft.core.LangDetect
import java.io.{File, PrintStream}

/** `lang` CLI subcommands — the reference's language-model maintenance
  * surface (resiliparse-py/resiliparse/cli.py: train_vectors :397-432,
  * evaluate :446-526, benchmark :529-584). Wraps the same kernels the
  * oracle-gated queries use (LangDetect.strToVec / trainExamples /
  * detectFastWith — t03..t07), so a model retrained here scores
  * identically to the distributed t05 Aggregator by construction.
  *
  *   lang train <indir> [--split=train] [--format=raw|c|bin] [--out=PATH]
  *   lang eval <indir> [--split=val|test] [--cutoff=1200] [--truncate=N]
  *                     [--langs=a,b] [--sort-lang] [--print-cm] [--profiles=DIR]
  *   lang dump-vectors [--format=c|raw|bin] [--out=PATH] [--profiles=DIR]
  *   lang benchmark <infile> [--rounds=N]
  *
  * `<indir>` follows the reference's dataset layout: one directory per
  * language code, each with `train.txt` / `val.txt` / `test.txt`, one
  * example per line (cli.py:409-415). `--format=bin` writes the
  * `lang_names.txt` + `lang_profiles.bin` pair [[LangDetect.loadBinary]]
  * reads back, `--format=c` the reference-compatible C header, and
  * `--format=raw` the reference's `(lang, vec)` text lines.
  */
object LangCli {

  /** Wikipedia language editions ordered by number of users — the
    * training-time profile ordering prior (cli.py:341-370 `_WIKI_BIAS`,
    * data from en.wikipedia.org/wiki/List_of_Wikipedias). Detection rank
    * bias `min(50, i*3)` keys off this position for short texts, so the
    * order is part of the model contract, not cosmetics.
    */
  val wikiBias: Vector[String] = Vector(
    "en", "es", "fr", "de", "zh", "ru", "pt", "it", "ar", "ja", "tr", "id", "nl", "simple",
    "pl", "fa", "he", "vi", "sv", "ko", "hi", "uk", "ro", "cs", "no", "fi", "hu", "da", "th",
    "ca", "bn", "el", "bg", "sr", "ms", "hr", "az", "zh-yue", "sk", "sl", "ta", "eo", "sh",
    "arz", "lt", "et", "ml", "la", "af", "mr", "bs", "sq", "ur", "ka", "eu", "gl", "tl", "nn",
    "hy", "ang", "kk", "be", "te", "lv", "mk", "my", "ast", "zh-classical", "sco", "als",
    "ceb", "is", "wuu", "mn", "be-tarask", "kn", "cy", "br", "uz", "gu", "an", "bar", "ne",
    "si", "lb", "jv", "zh-min-nan", "war", "sw", "ga", "ku", "ckb", "oc", "nds", "yi", "ia",
    "fy", "tt", "scn", "pa", "gan", "am", "lmo", "km", "tg", "sa", "ba", "azb", "io", "as",
    "vo", "ky", "pnb", "vec", "so", "cv", "or", "hak", "pdc", "hif", "ce", "bh", "mg", "su",
    "mzn", "ht", "nap", "qu", "ps", "fo", "li", "se", "bo", "gd", "pms", "nds-nl", "new",
    "bat-smg", "vls", "yo", "rue", "diq", "ace", "tk", "bpy", "dv", "hsb", "eml", "cu", "os",
    "wa", "sah", "ksh", "sc", "chr", "szl", "nah", "mt", "lad", "co", "pam", "ug", "bcl",
    "cdo", "arc", "rm", "gv", "got", "frr", "dsb", "ab", "crh", "xmf", "zu", "iu", "rmy",
    "cr", "ie", "ilo", "gn", "ext", "mi", "ha", "csb", "ay", "pcd", "sd", "map-bms", "min",
    "lo", "jbo", "nv", "sn", "haw", "frp", "vep", "ch", "glk", "lij", "wo", "udm", "cbk-zam",
    "kw", "bxr", "pap", "ee", "fur", "av", "kv", "roa-rup", "fiu-vro", "mhr", "ig", "stq",
    "bjn", "nrm", "mwl", "bug", "kl", "gag", "tpi", "bi", "zea", "kab", "ak", "ln", "myv",
    "tw", "xh", "na", "mai", "roa-tara", "nov", "rw", "pfl", "chy", "pih", "kaa", "mrj", "kg",
    "bm", "krc", "za", "sm", "lez", "pnt", "xal", "st", "om", "kbd", "to", "dz", "tn", "ks",
    "tet", "ts", "rn", "ny", "mdf", "gom", "ti", "fj", "lfn", "koi", "lbe", "ik", "tyv", "ki",
    "ff", "pag", "ss", "tum", "srn", "lg", "ty", "ve", "jam", "ltg", "pi", "hyw", "sg", "kr",
    "olo", "nso", "ady", "din", "lrc", "dty", "tcy", "sat", "aa", "hz", "ary", "ban", "kbp",
    "atj", "gor", "shn", "inh", "ng", "mus", "mh", "nqo", "ii", "mnw", "avk", "szy", "cho",
    "gcr", "ho", "kj", "smn", "awa", "lld", "mad", "alt", "mni", "dag", "skr", "nia", "trv",
    "tay", "shi")

  /** Sort language codes by wiki-user-count prior; codes outside the
    * table keep their relative listing order after it (cli.py:399-401).
    */
  def biasSort(langs: Seq[String]): Seq[String] = {
    val listIdx = langs.zipWithIndex.toMap
    langs.sortBy(l => wikiBias.indexOf(l) match {
      case -1 => wikiBias.length + listIdx(l)
      case i => i
    })
  }

  def run(args: Seq[String], flags: Seq[String], out: PrintStream): Int = {
    def flag(name: String): Boolean = flags.contains(s"--$name")
    def flagVal(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") => f.drop(name.length + 3) }
    def profileSet: Array[(String, Array[Int])] =
      flagVal("profiles").map(d => LangDetect.loadBinary(new File(d)))
        .getOrElse(LangDetect.profiles)

    args.headOption match {
      case Some("create-dataset") =>
        if (args.length != 3) { usage(out); return 2 }
        createDataset(new File(args(1)), new File(args(2)),
          flagVal("val-size").map(_.toInt).getOrElse(5),
          flagVal("test-size").map(_.toInt).getOrElse(5),
          flagVal("min-examples").map(_.toInt).getOrElse(10000), out)
      case Some("train") =>
        if (args.length != 2) { usage(out); return 2 }
        val indir = new File(args(1))
        val split = flagVal("split").getOrElse("train")
        val langs = biasSort(Option(indir.listFiles()).getOrElse(Array.empty)
          .filter(d => d.isDirectory && new File(d, s"$split.txt").isFile)
          .map(_.getName).toSeq.sorted)
        if (langs.isEmpty) { out.println(s"no <lang>/$split.txt under $indir"); return 1 }
        val vectors = langs.map { l =>
          val src = scala.io.Source.fromFile(new File(new File(indir, l), s"$split.txt"), "UTF-8")
          val vec = try LangDetect.trainExamples(src.getLines().filter(_.nonEmpty).to(Iterable))
            finally src.close()
          l -> vec
        }
        emit(vectors, flagVal("format").getOrElse("raw"), flagVal("out"), out)
      case Some("eval") =>
        if (args.length != 2) { usage(out); return 2 }
        eval(new File(args(1)), flagVal("split").getOrElse("val"),
          flagVal("cutoff").map(_.toInt).getOrElse(1200),
          flagVal("truncate").map(_.toInt),
          flagVal("langs").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet),
          flag("sort-lang"), flag("print-cm"), profileSet, out)
      case Some("dump-vectors") =>
        val profs = profileSet
        emit(profs.toSeq, flagVal("format").getOrElse("c"), flagVal("out"), out)
      case Some("benchmark") =>
        if (args.length != 2) { usage(out); return 2 }
        val raw = java.nio.file.Files.readAllBytes(new File(args(1)).toPath)
        val text = graft.core.Encodings.bytesToStr(raw).replace('\n', ' ')
        val rounds = flagVal("rounds").map(_.toInt).getOrElse(10000)
        out.println(s"Benchmarking language detector ($rounds rounds):")
        val t0 = System.nanoTime()
        var i = 0
        while (i < rounds) { LangDetect.detectFast(text); i += 1 }
        out.println(f"graft: ${(System.nanoTime() - t0) / 1e9}%.1fs")
        0
      case Some("download-wiki-dumps") =>
        if (args.length != 2) { usage(out); return 2 }
        downloadWikiDumps(args(1),
          flagVal("langs").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(DefaultWikiLangs),
          new File(flagVal("outdir").getOrElse("wikidumps")),
          flagVal("jobs").map(_.toInt).getOrElse(3),
          flagVal("base-url").getOrElse("https://dumps.wikimedia.org"),
          out)
      case _ => usage(out); 2
    }
  }

  /** The reference's default 180-language download list is its wiki-bias
    * ordering (cli.py:176-188 DEFAULT_WIKI_LANGS == the bias table).
    */
  private def DefaultWikiLangs: Seq[String] = wikiBias

  /** `lang download-wiki-dumps <dumpdate>` (resiliparse-py/resiliparse/
    * cli.py:190-236): per language, fetch
    * `{base}/{l}wiki/{dumpdate}/dumpstatus.json`, take the first file of
    * the `articlesmultistreamdump` job (skip languages without one),
    * stream the dump to `outdir/{l}wiki.{ext}` verifying its md5 —
    * a corrupt download is DELETED with a note, an HTTP error is
    * reported and the other languages proceed. `--jobs` bounds the
    * parallel fetches (the reference notes 3 is the Wikimedia rate
    * limit); `--base-url=` points tests at a loopback server.
    */
  private def downloadWikiDumps(dumpdate: String, langs: Seq[String],
      outdir: File, jobs: Int, baseUrl: String, out: PrintStream): Int = {
    if (!outdir.isDirectory) outdir.mkdirs()
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def fetch(url: String): java.io.InputStream = {
      val conn = new java.net.URL(url).openConnection()
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(120000)
      conn.getInputStream
    }
    def dl(l: String): Unit =
      try {
        val meta = {
          val in = fetch(s"$baseUrl/${l}wiki/$dumpdate/dumpstatus.json")
          try m.readTree(in) finally in.close()
        }
        val job = Option(meta.get("jobs")).map(_.get("articlesmultistreamdump")).orNull
        if (job == null || job.get("files") == null) return
        val file = job.get("files").elements().next()
        val url = file.get("url").asText()
        val md5sum = file.get("md5").asText()
        val ext = url.substring(url.lastIndexOf('.') + 1)
        val outFile = new File(outdir, s"${l}wiki.$ext")
        val digest = java.security.MessageDigest.getInstance("MD5")
        val in = fetch(s"$baseUrl$url")
        val o = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(outFile))
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = 0
          while ({ n = in.read(buf); n >= 0 }) {
            digest.update(buf, 0, n)
            o.write(buf, 0, n)
          }
        } finally { o.close(); in.close() }
        val got = digest.digest().map(b => f"$b%02x").mkString
        if (got != md5sum) {
          out.println(s"""Output "${outFile.getName}" corrupted, deleting it.""")
          outFile.delete()
        } else out.println(s"${outFile.getName}: ${outFile.length()} bytes")
      } catch {
        case e: java.io.IOException =>
          out.println(s"Error downloading ${l}wiki: ${e.getMessage}")
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, jobs))
    try {
      val futures = langs.map(l => pool.submit(new Runnable { def run(): Unit = dl(l) }))
      futures.foreach(_.get())
    } finally pool.shutdown()
    0
  }

  /** Build a language-detection dataset from extracted-wiki plaintext
    * dirs (cli.py:239-330): one `<lang>[wiki]/.../wiki_*` tree per
    * language in, one `<lang>/{train,val,test}.txt` per language out.
    * Per line: NFKC normalize, strip `[[`/`]]` wiki link markup, drop
    * lines under 200 chars and `<doc id=`/`</doc>` wrapper tags,
    * sha1-dedup. Split boundaries mirror the reference exactly,
    * including its off-by-one (the example at index test_end lands in
    * TRAIN: `test_end < i < val_end`). One deliberate delta: the
    * reference iterates a Python set (unspecified order); examples here
    * order by sha1 hex so the split is REPRODUCIBLE — the same contract
    * the distributed t38 query pins with md5 order. Languages below
    * `minExamples` produce no output, like the reference.
    */
  private def createDataset(indir: File, outdir: File, valSize: Int,
      testSize: Int, minExamples: Int, out: PrintStream): Int = {
    val langDirs = Option(indir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName)
    if (langDirs.isEmpty) { out.println(s"no language dirs under $indir"); return 1 }
    val markup = "\\[\\[|\\]\\]".r
    langDirs.foreach { ld =>
      val lang = ld.getName.replace("wiki", "")
      def walk(d: File): Iterator[File] =
        Option(d.listFiles()).getOrElse(Array.empty).iterator.flatMap(f =>
          if (f.isDirectory) walk(f) else Iterator.single(f))
      val byHash = scala.collection.mutable.Map.empty[String, String]
      walk(ld).filter(_.getName.startsWith("wiki_")).foreach { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().foreach { line0 =>
          val line = markup.replaceAllIn(
            java.text.Normalizer.normalize(line0, java.text.Normalizer.Form.NFKC), "")
          if (line.length >= 200 && !line.startsWith("<doc id=") &&
              !line.startsWith("</doc>")) {
            val h = java.security.MessageDigest.getInstance("SHA-1")
              .digest(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString
            byHash.getOrElseUpdate(h, line)
          }
        } finally src.close()
      }
      if (byHash.size < minExamples)
        out.println(s"$lang: only ${byHash.size} examples (< $minExamples), skipped")
      else {
        val d = new File(outdir, lang)
        d.mkdirs()
        val ordered = byHash.toSeq.sortBy(_._1).map(_._2)
        val n = ordered.size
        val testEnd = math.floor(n * testSize * 0.01).toInt
        val valEnd = testEnd + math.floor(n * valSize * 0.01).toInt
        val ws = Seq("test", "val", "train").map(sp =>
          sp -> new java.io.PrintWriter(new File(d, s"$sp.txt"), "UTF-8")).toMap
        try ordered.zipWithIndex.foreach { case (line, i) =>
          val sp = if (i < testEnd) "test"
            else if (i > testEnd && i < valEnd) "val"
            else "train"
          ws(sp).println(line)
        } finally ws.values.foreach(_.close())
        out.println(s"$lang: $n examples -> test=$testEnd " +
          s"val=${math.max(0, valEnd - testEnd - 1)} " +
          s"train=${n - testEnd - math.max(0, valEnd - testEnd - 1)}")
      }
    }
    0
  }

  private def emit(vectors: Seq[(String, Array[Int])], format: String,
      outPath: Option[String], out: PrintStream): Int = format match {
    case "bin" =>
      val dir = new File(outPath.getOrElse("."))
      LangDetect.writeBinary(vectors, dir)
      out.println(s"${vectors.length} profiles -> $dir/lang_names.txt + lang_profiles.bin")
      0
    case "c" =>
      val header = LangDetect.toCHeader(vectors)
      outPath match {
        case Some(p) =>
          java.nio.file.Files.write(new File(p).toPath,
            header.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.println(s"${vectors.length} profiles -> $p")
        case None => out.print(header)
      }
      0
    case "raw" =>
      out.println("# (lang, vec)")
      vectors.foreach { case (l, v) => out.println(s"($l, [${v.mkString(", ")}])") }
      0
    case other => out.println(s"unknown format: $other"); 2
  }

  /** Per-language precision/recall/F1 + overall accuracy over a held-out
    * split (cli.py:446-526). Unknown predictions count as label `-`.
    */
  private def eval(indir: File, split: String, cutoff: Int, truncate: Option[Int],
      langFilter: Option[Set[String]], sortLang: Boolean, printCm: Boolean,
      profs: Array[(String, Array[Int])], out: PrintStream): Int = {
    val inLangs = Option(indir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new File(d, s"$split.txt").isFile)
      .map(_.getName).filter(l => langFilter.forall(_.contains(l))).sorted.toSeq
    if (inLangs.isEmpty) { out.println(s"no <lang>/$split.txt under $indir"); return 1 }

    val recallHit = collection.mutable.Map.empty[String, (Int, Int)].withDefaultValue((0, 0))
    val precHit = collection.mutable.Map.empty[String, (Int, Int)].withDefaultValue((0, 0))
    val confusion = collection.mutable.Map.empty[(String, String), Int].withDefaultValue(0)
    inLangs.foreach { lang =>
      val src = scala.io.Source.fromFile(new File(new File(indir, lang), s"$split.txt"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).foreach { line0 =>
        val line = truncate.fold(line0)(line0.take)
        val pred0 = LangDetect.detectFastWith(profs, line, cutoff, langFilter)._1
        val pred = if (pred0 == "unknown") "-" else pred0
        val hit = if (pred == lang) 1 else 0
        val (rh, rn) = recallHit(lang); recallHit(lang) = (rh + hit, rn + 1)
        val (ph, pn) = precHit(pred); precHit(pred) = (ph + hit, pn + 1)
        confusion((lang, pred)) += 1
      } finally src.close()
    }

    val results = inLangs.map { lang =>
      val (ph, pn) = precHit(lang)
      val (rh, rn) = recallHit(lang)
      val precision = ph.toDouble / math.max(1, pn)
      val recall = rh.toDouble / math.max(1, rn)
      val f1 = if (precision + recall == 0) 0.0
        else 2.0 * precision * recall / (precision + recall)
      (lang, precision, recall, f1, rn)
    }
    out.println("Lang, Precision, Recall, F1, Num Examples")
    val ordered = if (sortLang) results else results.sortBy(-_._4)
    ordered.foreach { case (l, p, r, f1, n) =>
      out.println(f"$l, $p%.2f, $r%.2f, $f1%.2f, $n")
    }
    val total = results.map(_._5).sum
    val acc = results.map(r => r._3 * r._5).sum / math.max(1, total)
    out.println(f"%nAccuracy: $acc%.2f")

    if (printCm) {
      val labels = inLangs :+ "-"
      val w = math.max(labels.map(_.length).max,
        confusion.values.map(_.toString.length).maxOption.getOrElse(1)) + 2
      out.println()
      out.println("Confusion matrix:")
      out.println(" " * labels.map(_.length).max +
        labels.map(l => l.reverse.padTo(w, ' ').reverse).mkString)
      inLangs.foreach { l1 =>
        out.println(l1.padTo(labels.map(_.length).max, ' ') +
          labels.map(l2 => confusion((l1, l2)).toString.reverse.padTo(w, ' ').reverse).mkString)
      }
    }
    0
  }

  private def usage(out: PrintStream): Unit = out.println(
    """usage: graft.tools.Cli lang <subcommand> [args]
      |  lang create-dataset <indir> <outdir> [--val-size=5] [--test-size=5] [--min-examples=10000]
      |  lang train <indir> [--split=train] [--format=raw|c|bin] [--out=PATH]
      |  lang eval <indir> [--split=val|test] [--cutoff=1200] [--truncate=N]
      |                    [--langs=a,b] [--sort-lang] [--print-cm] [--profiles=DIR]
      |  lang dump-vectors [--format=c|raw|bin] [--out=PATH] [--profiles=DIR]
      |  lang benchmark <infile> [--rounds=N]
      |  lang download-wiki-dumps <dumpdate> [--langs=a,b] [--outdir=wikidumps]
      |                           [--jobs=3] [--base-url=U]""".stripMargin)
}
