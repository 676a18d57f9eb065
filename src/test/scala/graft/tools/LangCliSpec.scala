package graft.tools

import graft.core.LangDetect
import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayOutputStream, File, PrintStream, PrintWriter}

/** The `lang` CLI surface (cli.py:397-584): train on a dataset dir,
  * dump as raw / C header / loadable binary, evaluate a held-out split,
  * and — the contract that matters — retrain→dump→reload reproduces
  * the same detector the t03..t07 queries run.
  */
class LangCliSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val ps = new PrintStream(bos, true, "UTF-8")
    val code = Cli.run(args.toArray, ps)
    ps.flush()
    (code, bos.toString("UTF-8"))
  }

  /** Tiny three-language corpus with distinctive character n-grams. */
  private def makeDataset(): File = {
    val root = java.nio.file.Files.createTempDirectory("graft_langds").toFile
    val corpora = Map(
      "en" -> Seq(
        "the quick brown fox jumps over the lazy dog and the cat sat on the mat with them",
        "this is another example sentence in the english language for training the vector",
        "where there is smoke there is fire and the weather changes with the seasons there"),
      "de" -> Seq(
        "der schnelle braune fuchs springt ueber den faulen hund und die katze schlaeft",
        "dies ist ein weiterer beispielsatz in deutscher sprache zum trainieren des vektors",
        "wo rauch ist da ist auch feuer und das wetter wechselt mit den jahreszeiten immer"),
      "fr" -> Seq(
        "le renard brun rapide saute par dessus le chien paresseux et le chat dort bien",
        "ceci est une autre phrase exemple en langue francaise pour entrainer le vecteur",
        "il n'y a pas de fumee sans feu et le temps change avec les saisons chaque annee"))
    corpora.foreach { case (lang, lines) =>
      val d = new File(root, lang); d.mkdirs()
      Seq("train", "val").foreach { split =>
        val w = new PrintWriter(new File(d, s"$split.txt"), "UTF-8")
        try lines.foreach(w.println) finally w.close()
      }
    }
    root
  }

  test("train --format=bin round-trips through loadBinary and detects the training langs") {
    val ds = makeDataset()
    val out = java.nio.file.Files.createTempDirectory("graft_langbin").toFile
    val (code, msg) = run("lang", "train", ds.getAbsolutePath,
      "--format=bin", s"--out=${out.getAbsolutePath}")
    assert(code == 0, msg)
    val profs = LangDetect.loadBinary(out)
    // bias order: en, fr, de (wiki-user prior), not alphabetical
    assert(profs.map(_._1).toSeq == Seq("en", "fr", "de"))
    assert(profs.forall(_._2.length == LangDetect.VecSize))
    // the freshly trained model separates its own training languages
    val (en, _) = LangDetect.detectFastWith(profs,
      "the dog and the cat sat with the fox over there in the weather")
    val (de, _) = LangDetect.detectFastWith(profs,
      "der hund und die katze springen ueber den fuchs bei diesem wetter")
    assert(en == "en")
    assert(de == "de")
  }

  test("train --format=c emits the reference-shaped header; raw lists (lang, vec)") {
    val ds = makeDataset()
    val (code, header) = run("lang", "train", ds.getAbsolutePath, "--format=c")
    assert(code == 0)
    assert(header.contains("#define LANG_VEC_SIZE 256"))
    assert(header.contains("typedef const uint8_t lang_vec_t[LANG_VEC_SIZE];"))
    assert(header.contains("""{"en", {"""))
    val (code2, raw) = run("lang", "train", ds.getAbsolutePath, "--format=raw")
    assert(code2 == 0)
    assert(raw.linesIterator.next() == "# (lang, vec)")
    assert(raw.linesIterator.count(_.startsWith("(")) == 3)
  }

  test("eval reports per-language precision/recall/F1 and accuracy on the val split") {
    val ds = makeDataset()
    // train + dump, then evaluate with the retrained model (not the shipped one)
    val out = java.nio.file.Files.createTempDirectory("graft_langev").toFile
    assert(run("lang", "train", ds.getAbsolutePath, "--format=bin",
      s"--out=${out.getAbsolutePath}")._1 == 0)
    val (code, report) = run("lang", "eval", ds.getAbsolutePath,
      s"--profiles=${out.getAbsolutePath}", "--cutoff=1200")
    assert(code == 0, report)
    assert(report.linesIterator.next() == "Lang, Precision, Recall, F1, Num Examples")
    // val split == train split here, so the mean-vector model must be perfect
    Seq("en", "de", "fr").foreach(l =>
      assert(report.contains(s"$l, 1.00, 1.00, 1.00, 3"), s"$l row in:\n$report"))
    assert(report.contains("Accuracy: 1.00"))
  }

  test("eval --print-cm emits a square confusion matrix") {
    val ds = makeDataset()
    val (code, report) = run("lang", "eval", ds.getAbsolutePath, "--print-cm")
    assert(code == 0)
    assert(report.contains("Confusion matrix:"))
  }

  test("dump-vectors --format=bin reproduces the shipped 101-profile model exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft_langdump").toFile
    val (code, _) = run("lang", "dump-vectors", "--format=bin",
      s"--out=${out.getAbsolutePath}")
    assert(code == 0)
    val reloaded = LangDetect.loadBinary(out)
    assert(reloaded.length == LangDetect.profiles.length)
    reloaded.zip(LangDetect.profiles).foreach { case ((n1, v1), (n2, v2)) =>
      assert(n1 == n2)
      assert(v1.sameElements(v2))
    }
    // t07's supported_langs surface is reproduced by the reloaded pair
    assert(reloaded.map(_._1).sorted.toSeq == LangDetect.supportedLangs)
  }

  test("dump-vectors --format=c round-trips every shipped vector through the header text") {
    val (code, header) = run("lang", "dump-vectors", "--format=c")
    assert(code == 0)
    val rows = header.linesIterator.filter(_.trim.startsWith("{\"")).toSeq
    assert(rows.length == 101)
    val parsed = rows.map { r =>
      val name = r.trim.drop(2).takeWhile(_ != '"')
      val vec = r.dropWhile(_ != '{').drop(1).dropWhile(_ != '{').drop(1)
        .takeWhile(_ != '}').split(",").map(_.trim.toInt)
      name -> vec
    }
    parsed.zip(LangDetect.profiles).foreach { case ((n1, v1), (n2, v2)) =>
      assert(n1 == n2)
      assert(v1.sameElements(v2), s"vector mismatch for $n1")
    }
  }

  test("lang benchmark times the detector on a file") {
    val f = java.nio.file.Files.createTempFile("graft_langbench", ".txt")
    java.nio.file.Files.write(f, "the quick brown fox\n".getBytes("UTF-8"))
    val (code, out) = run("lang", "benchmark", f.toString, "--rounds=50")
    assert(code == 0)
    assert(out.contains("50 rounds"))
    assert(out.contains("graft:"))
  }

  test("biasSort orders known codes by wiki prior and appends unknown codes in listing order") {
    assert(LangCli.biasSort(Seq("de", "zz-novel", "en", "fr")) ==
      Seq("en", "fr", "de", "zz-novel"))
  }

  test("lang with a bogus subcommand exits 2") {
    assert(run("lang", "frobnicate")._1 == 2)
  }

  test("create-dataset: wiki_ tree -> deduped split files; markup stripped; " +
      "short lines, doc tags, and small languages dropped") {
    val in = java.nio.file.Files.createTempDirectory("graft_cds_in").toFile
    val outDir = java.nio.file.Files.createTempDirectory("graft_cds_out").toFile
    val pad = "x" * 200
    def mkLang(name: String, lines: Seq[String]): Unit = {
      val sub = new File(new File(in, name), "AA"); sub.mkdirs()
      val w = new PrintWriter(new File(sub, "wiki_00"), "UTF-8")
      try lines.foreach(w.println) finally w.close()
      // a non-wiki_ file that must be ignored
      val skip = new PrintWriter(new File(sub, "notes.txt"), "UTF-8")
      try skip.println("ignored " + pad) finally skip.close()
    }
    val enLines = (1 to 40).map(i => s"en example $i $pad") ++ Seq(
      s"en example 1 $pad",        // exact duplicate -> dedup
      "short line",                 // < 200 chars -> dropped
      s"""<doc id="7">$pad""",      // wrapper tag -> dropped
      s"</doc>$pad",                // wrapper tag -> dropped
      s"with [[link]] markup $pad") // markup stripped, kept
    mkLang("enwiki", enLines)
    mkLang("dewiki", Seq(s"de example $pad")) // 1 < min-examples -> skipped
    val (code, msg) = run("lang", "create-dataset", in.getAbsolutePath,
      outDir.getAbsolutePath, "--min-examples=10")
    assert(code == 0, msg)
    assert(msg.contains("de: only 1 examples"))
    // "wiki" suffix stripped from the language name
    val en = new File(outDir, "en")
    assert(en.isDirectory)
    assert(!new File(outDir, "de").exists())
    def lines(f: String): Seq[String] = {
      val s = scala.io.Source.fromFile(new File(en, f), "UTF-8")
      try s.getLines().toVector finally s.close()
    }
    val (test_, val_, train) = (lines("test.txt"), lines("val.txt"), lines("train.txt"))
    // 41 unique examples (40 numbered + the de-markup'd one); dup/short/
    // tags dropped. test_end = floor(41*0.05) = 2; val gets indices
    // 3..3 (the reference's off-by-one leaves index 2 in TRAIN)
    assert(test_.size + val_.size + train.size == 41)
    assert(test_.size == 2)
    assert(val_.size == 1)
    assert(train.size == 38)
    // markup was stripped, not the whole line
    val all = test_ ++ val_ ++ train
    assert(all.exists(_.startsWith("with link markup")))
    assert(all.forall(l => !l.contains("[[") && l.length >= 200))
    // deterministic: a second run reproduces the same split exactly
    val out2 = java.nio.file.Files.createTempDirectory("graft_cds_out2").toFile
    assert(run("lang", "create-dataset", in.getAbsolutePath,
      out2.getAbsolutePath, "--min-examples=10")._1 == 0)
    def lines2(f: String): Seq[String] = {
      val s = scala.io.Source.fromFile(new File(new File(out2, "en"), f), "UTF-8")
      try s.getLines().toVector finally s.close()
    }
    assert(lines2("test.txt") == test_ && lines2("val.txt") == val_ &&
      lines2("train.txt") == train)
  }

  test("create-dataset output feeds train/eval round-trip") {
    val in = java.nio.file.Files.createTempDirectory("graft_cds_rt_in").toFile
    def mk(name: String, word: String): Unit = {
      val sub = new File(new File(in, name), "AA"); sub.mkdirs()
      val w = new PrintWriter(new File(sub, "wiki_00"), "UTF-8")
      try (1 to 30).foreach(i => w.println(
        (s"$word sentence number $i with distinctive words " * 6).take(260)))
      finally w.close()
    }
    mk("enwiki", "the quick brown fox and the lazy dog over there")
    mk("dewiki", "der schnelle braune fuchs und der faule hund dort")
    val ds = java.nio.file.Files.createTempDirectory("graft_cds_rt_ds").toFile
    assert(run("lang", "create-dataset", in.getAbsolutePath, ds.getAbsolutePath,
      "--min-examples=5")._1 == 0)
    val (code, report) = run("lang", "eval", ds.getAbsolutePath, "--split=val",
      "--langs=en,de")
    assert(code == 0, report)
    assert(report.contains("Accuracy:"))
  }
}
