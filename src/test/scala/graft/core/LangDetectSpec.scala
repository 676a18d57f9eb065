package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Parity with the reference's lang tests
  * (tests/resiliparse/parse/test_lang.py:86-110) over its Wikipedia
  * sample paragraphs (ported to a test resource).
  */
class LangDetectSpec extends AnyFunSuite {

  private val samples: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/lang_samples.tsv")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t", 2)
      k -> v.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
    }.toSeq
    finally in.close()
  }

  test("101 languages are loaded") {
    assert(LangDetect.profiles.length == 101)
    assert(LangDetect.supportedLangs.size == 101)
    assert(LangDetect.profiles.head._1 == "en") // reference order preserved
  }

  test("every reference sample detects as its language") {
    samples.foreach { case (l, text) =>
      val (detected, rank) = LangDetect.detectFast(text)
      assert(detected == l, s"expected $l got $detected (rank $rank)")
    }
  }

  test("top-k results lead with the right language") {
    samples.foreach { case (l, text) =>
      val top = LangDetect.detectTopK(text, 2)
      assert(top.nonEmpty && top.head._1 == l, s"$l -> $top")
    }
  }

  test("lang restriction and unknown") {
    assert(LangDetect.detectFast("This is an average English sentence",
      langs = Some(Set("en", "zh")))._1 == "en")
    assert(LangDetect.detectFast("This is an average English sentence",
      langs = Some(Set("xx")))._1 == "unknown")
  }

  test("train_language_examples yields distinct non-zero vectors") {
    val vecs = samples.map { case (_, text) => LangDetect.trainExamples(Seq(text)).toSeq }
    vecs.foreach(v => assert(v.exists(_ != 0)))
    assert(vecs.distinct.size == vecs.size)
  }

  test("rank monotonicity: closer profile -> lower rank; cutoff respected") {
    val (l, r) = LangDetect.detectFast("a")
    assert(l == "unknown" || r >= 0)
  }
}
