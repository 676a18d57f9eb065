package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: every registered function must be callable from
  * `spark.sql` and agree with its Column-API form — a SQL-only user gets
  * the same kernels (and the same expression trees) the DataFrame API
  * builds.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    // spark.sql.extensions is a STATIC conf: getOrCreate() silently
    // ignores it when an earlier suite's un-stopped session still
    // exists in this JVM, which would fail every test here depending
    // on suite order. Stop any leaked session so a fresh one is built
    // with the extensions applied (later suites getOrCreate their own).
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").appName("extensions-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("text kernels from SQL match the Column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis
    val s = spark
    import s.implicits._
    val df = Seq("the a of and is to in some words here").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT token_count(text) AS tc, quality_score(text) AS qs,
         doc_fingerprint(text) AS fp, simhash64(text) AS sh
         FROM ext_docs""").head
    val viaCols = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.fingerprint(col("text")),
      TextAnalysis.simhash64(col("text"))).head
    assert(viaSql.getLong(0) == viaCols.getLong(0))
    assert(viaSql.getDouble(1) == viaCols.getDouble(1))
    assert(viaSql.getString(2) == viaCols.getString(2))
    assert(viaSql.getString(3) == viaCols.getString(3))
  }

  test("extract_plain_text and detect_lang work from pure SQL") {
    val s = spark
    import s.implicits._
    Seq(Tuple1("<html><body><p>Hello extraction world</p></body></html>"
        .getBytes("UTF-8")))
      .toDF("body").createOrReplaceTempView("ext_pages")
    val row = spark.sql(
      """SELECT extract_plain_text(body, 'utf-8') AS txt,
         detect_lang(extract_plain_text(body, 'utf-8')).lang AS lang
         FROM ext_pages""").head
    assert(row.getString(0).contains("Hello extraction world"))
    assert(row.getString(1) != null)
  }

  test("nfc_normalize works from pure SQL and agrees with the Column API") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("café nfc", "plain").toDF("text")
    df.createOrReplaceTempView("ext_nfc")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(text) AS n FROM ext_nfc ORDER BY n").collect()
    val viaCol = df.select(
        graft.functions.TextAnalysis.nfcNormalize(col("text")).as("n"))
      .orderBy("n").collect()
    assert(viaSql.map(_.getString(0)).toSeq == viaCol.map(_.getString(0)).toSeq)
    assert(viaSql.map(_.getString(0)).contains("caf\u00e9 nfc"))
  }

  test("blocklist_counts works from pure SQL and agrees with the Column API") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("slow fast merge fast", "nothing here").toDF("text")
    df.createOrReplaceTempView("ext_bl")
    val viaSql = spark.sql(
      """SELECT blocklist_counts(text, 'fast', 'fast merge', 'low') AS c
         FROM ext_bl ORDER BY c[0] DESC""").collect()
    val viaCol = df.select(graft.functions.TextAnalysis
        .blocklistCounts(col("text"), Seq("fast", "fast merge", "low")).as("c"))
      .orderBy(element_at(col("c"), 1).desc).collect()
    assert(viaSql.map(_.getSeq[Long](0)).toSeq == viaCol.map(_.getSeq[Long](0)).toSeq)
    assert(viaSql.head.getSeq[Long](0) == Seq(2L, 1L, 1L))
    // non-literal term is an analysis-time error
    val e = intercept[Exception] {
      spark.sql("SELECT blocklist_counts(text, text) FROM ext_bl").collect()
    }
    assert(e.getMessage.contains("string literals"))
  }

  test("jpeg_pixel_grid works from pure SQL against the crafted fixture") {
    val j = graft.queries.Multimodal.craftGrayJpeg(Seq(-64, 63))
    spark.createDataFrame(Seq((1, j))).toDF("id", "data")
      .createOrReplaceTempView("ext_jpegs")
    val rows = spark.sql(
      """SELECT p.x, p.r FROM ext_jpegs
         LATERAL VIEW explode(jpeg_pixel_grid(data, 2)) t AS p
         ORDER BY p.y, p.x""").collect()
    // 2x2 corners of the 16x8 image: x 0 -> block0 (64), x 15 -> block1 (191)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 64), (15, 191), (0, 64), (15, 191)))
  }

  test("jpeg_dhash from SQL matches the kernel on a crafted 2-D grid") {
    val g = graft.queries.Multimodal.m09Grids.head._2
    val j = graft.queries.Multimodal.craftGrayJpeg2D(g)
    spark.createDataFrame(Seq((1, j), (2, "junk".getBytes)))
      .toDF("id", "data").createOrReplaceTempView("ext_dhash")
    val rows = spark.sql(
      """SELECT id, jpeg_dhash(data).h0 AS h0, jpeg_dhash(data).h1 AS h1
         FROM ext_dhash ORDER BY id""").collect()
    val want = graft.functions.Multimodal.jpegDhashOf(j)
    assert(rows(0).getLong(1) == want.h0 && rows(0).getLong(2) == want.h1)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("audio_fingerprint / image_resize / mjpeg_frame_dhash from SQL " +
      "match the kernels") {
    import graft.queries.{Multimodal => Q}
    val wav = Q.makeWav(1, 8000, 16, Q.squareSamples(Q.m10Amps.head._2, 400))
    val jpeg = Q.craftGrayJpeg2D(Q.m09Grids.head._2)
    val avi = Q.makeAvi(64, 64, 40000,
      Q.m11Clips.head._2.map(Q.craftGrayJpeg2D))
    spark.createDataFrame(Seq((1, wav, jpeg, avi)))
      .toDF("id", "wav", "jpeg", "avi").createOrReplaceTempView("ext_media")
    val r = spark.sql(
      """SELECT audio_fingerprint(wav, 400).h0 AS a0,
           size(image_resize(jpeg, 4, 4)) AS np,
           size(mjpeg_frame_dhash(avi, 4)) AS nf,
           mjpeg_frame_dhash(avi, 4)[0].h0 AS f0
         FROM ext_media""").collect()(0)
    assert(r.getLong(0) ==
      graft.functions.Multimodal.audioFingerprintOf(wav, 400).h0)
    assert(r.getInt(1) == 16 && r.getInt(2) == 4)
    assert(r.getLong(3) == graft.functions.Multimodal.jpegDhashOf(
      Q.craftGrayJpeg2D(Q.m11Clips.head._2.head)).h0)
  }

  test("arity errors surface as analysis failures, not task failures") {
    val e = intercept[Exception](spark.sql("SELECT token_count()").collect())
    assert(e.getMessage.contains("token_count") ||
      e.getMessage.toLowerCase.contains("argument"))
  }

  test("encoding/content/dedup kernels from SQL match the Column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Similarity, TextAnalysis, Web}
    val s = spark
    import s.implicits._
    val html = "<html><head><title>T One</title></head>" +
      "<body><a href='/x'>x</a><a href='http://b.example/y'>y</a></body></html>"
    val df = Seq((html.getBytes("UTF-8"), "utf-8", "http://a.example/p/"))
      .toDF("body", "cs", "base")
    df.createOrReplaceTempView("ext_pages")
    val viaSql = spark.sql(
      """SELECT detect_encoding(body) AS enc, detect_mime(body) AS mime,
         bytes_to_str(body) AS txt, html_title(body, cs) AS title,
         extract_links(body, cs, base) AS links
         FROM ext_pages""").head
    val viaCols = df.select(Web.detectEncoding(col("body")),
      Web.detectMime(col("body")), Web.decodeText(col("body")),
      Web.htmlTitle(col("body"), col("cs")),
      Web.extractLinks(col("body"), col("cs"), col("base"))).head
    assert(viaSql.getString(0) == viaCols.getString(0))
    assert(viaSql.getString(1) == viaCols.getString(1))
    assert(viaSql.getString(2) == viaCols.getString(2))
    assert(viaSql.getString(3) == "T One")
    assert(viaSql.getSeq[String](4) == viaCols.getSeq[String](4) &&
      viaSql.getSeq[String](4).contains("http://a.example/x"))

    val toks = Seq(Seq("a b c", "b c d", "c d e")).toDF("sh")
    toks.createOrReplaceTempView("ext_shingles")
    val sigSql = spark.sql(
      "SELECT minhash_signature(sh, 4) AS sig FROM ext_shingles").head.getSeq[Long](0)
    val sigCol = toks.select(TextAnalysis.minhashSignature(col("sh"), 4)).head.getSeq[Long](0)
    assert(sigSql == sigCol && sigSql.length == 4)

    val vecs = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val cosSql = spark.sql("SELECT cosine_sim(a, b) AS c FROM ext_vecs").head.getDouble(0)
    val cosCol = vecs.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(cosSql == cosCol && math.abs(cosSql - 0.5) < 1e-12)
  }

  test("canonical_url from SQL matches the Column API and the frontier rules") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val urls = Seq(
      "https://WWW.Example.COM:443/article/?utm_source=feed&p=3",
      "https://example.com/article?p=3",
      "https://www.example.com/",
      "https://example.com?utm_source=x",
      "HTTP://WWW.Example.COM:80/a/",
      "http://example.com/a",
      "http://example.com:8080/a").toDF("u")
    urls.createOrReplaceTempView("ext_urls")
    val sql = spark.sql("SELECT canonical_url(u) AS c FROM ext_urls")
      .collect().map(_.getString(0)).toSeq
    val colApi = urls.select(graft.functions.Web.canonicalUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(sql == colApi)
    // the first two variants collapse to the same canonical page
    assert(sql(0) == "https://example.com/article?p=3" && sql(0) == sql(1))
    assert(sql(2) == "https://example.com/")
    assert(sql(3) == "https://example.com/")
    // scheme-aware: http default port drops, a NON-default port survives
    assert(sql(4) == "http://example.com/a" && sql(4) == sql(5))
    assert(sql(6) == "http://example.com:8080/a")
  }

  test("canonical_url is idempotent over the messy-variant product space") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    // the full combinatorial space of variants the canonicalizer
    // handles; idempotence is what makes the output safe to STORE as a
    // frontier key and re-gate against later
    val urls = (for {
      scheme <- Seq("http", "HTTPS")
      www <- Seq("", "WWW.", "www.")
      host <- Seq("Example.COM", "sub.example.org")
      port <- Seq("", ":443", ":80", ":8080")
      path <- Seq("", "/", "/a/b.html", "/a/b/")
      qs <- Seq("", "?p=1", "?utm_source=x", "?utm_source=x&p=1&a=2")
    } yield s"$scheme://$www$host$port$path$qs").toDF("u")
    val once = urls.select(graft.functions.Web.canonicalUrl(col("u")).as("c1"))
    val twice = once.select(col("c1"),
      graft.functions.Web.canonicalUrl(col("c1")).as("c2"))
    val broken = twice.filter(col("c1") =!= col("c2")).collect()
    assert(broken.isEmpty,
      s"canonical_url not idempotent for: ${broken.take(5).mkString(", ")}")
    // and the space collapses to EXACTLY its identity-bearing product:
    // 2 schemes x 2 hosts x 3 ports (empty, :8080, and the OTHER
    // scheme's default, which is identity-bearing here) x 3 paths
    // ("" and "/" and "/a/b/"-trimmed merge pairwise) x 3 param sets
    // ("" and "?utm" merge; sorted "?a=2&p=1" and "?p=1" survive)
    val n = once.distinct().count()
    assert(n == 108L, s"expected 108 canonical of ${urls.count()}, got $n")
  }
}
