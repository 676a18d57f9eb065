package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal binary columns: header metadata, features, pixel decode,
  * and the AV-sampling stub's plumbing.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("multimodal-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def makeImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("imageMetaOf parses png/gif/bmp/jpeg headers") {
    assert(Multimodal.imageMetaOf(makeImage(31, 17, 0x123456, "png")) ==
      Multimodal.ImageMeta("png", 31, 17))
    assert(Multimodal.imageMetaOf(makeImage(12, 34, 0xff0000, "gif")) ==
      Multimodal.ImageMeta("gif", 12, 34))
    assert(Multimodal.imageMetaOf(makeImage(8, 9, 0x00ff00, "bmp")) ==
      Multimodal.ImageMeta("bmp", 8, 9))
    assert(Multimodal.imageMetaOf(makeImage(20, 10, 0x888888, "jpg")) ==
      Multimodal.ImageMeta("jpeg", 20, 10))
    assert(Multimodal.imageMetaOf("not an image at all".getBytes) == null)
  }

  test("binary media columns flow through a DataFrame with typed metadata") {
    val ss = spark; import ss.implicits._
    val rows = Seq(
      (1L, makeImage(31, 17, 0x406080, "png")),
      (2L, makeImage(5, 5, 0xffffff, "gif")),
      (3L, "junk-bytes".getBytes))
    val df = rows.toDF("media_id", "payload")
    val out = df.select(col("media_id"),
        Multimodal.imageMeta(col("payload")).as("meta"),
        Multimodal.byteHistogram(col("payload"), 16).as("features"))
      .orderBy("media_id").collect()
    assert(out(0).getStruct(1).getString(0) == "png")
    assert(out(0).getStruct(1).getInt(1) == 31 && out(0).getStruct(1).getInt(2) == 17)
    assert(out(1).getStruct(1).getString(0) == "gif")
    assert(out(2).isNullAt(1)) // junk -> null metadata, no task failure
    out.foreach { r =>
      val feats = r.getSeq[Double](2)
      assert(feats.size == 16)
      assert(math.abs(feats.sum - 1.0) < 1e-3)
    }
  }

  test("pixel decode via ImageIO: dimensions and mean color") {
    val ss = spark; import ss.implicits._
    val df = Seq((1L, makeImage(10, 10, 0x405060, "png"))).toDF("id", "payload")
    val st = df.select(Multimodal.pixelStats(col("payload")).as("s")).head.getStruct(0)
    assert(st.getInt(0) == 10 && st.getInt(1) == 10)
    assert(st.getDouble(2) == 0x40.toDouble)
    assert(st.getDouble(3) == 0x50.toDouble)
    assert(st.getDouble(4) == 0x60.toDouble)
  }

  test("av frame-sample stub: deterministic offsets, real plumbing") {
    val ss = spark; import ss.implicits._
    val payload = (0 until 1000).map(_.toByte).toArray
    val df = Seq((1L, payload)).toDF("id", "payload")
    val frames = df.select(Multimodal.avFrameSample(col("payload"), 4, 16).as("f"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(frames.size == 4)
    assert(frames.map(_.getLong(0)) == Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.getAs[Array[Byte]](1).length == 16))
  }
}
