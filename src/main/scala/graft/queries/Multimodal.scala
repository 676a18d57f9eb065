package graft.queries

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary media payloads with typed metadata
  * (see graft.functions.Multimodal). Inputs are deterministic generated
  * images (lossless formats), so the decode pipeline's output is exact.
  */
object Multimodal {

  private def makeImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload -> header metadata + full pixel decode, including a
    // corrupt row that must yield nulls, never a task failure.
    "m01_image_meta" -> ((s, _) => {
      import graft.functions.{Multimodal => M}
      val rows = Seq(
        (1L, makeImage(31, 17, 0x406080, "png")),
        (2L, makeImage(12, 34, 0xff0000, "gif")),
        (3L, makeImage(8, 9, 0x102030, "bmp")),
        (4L, "corrupt media payload".getBytes))
      val df = s.createDataFrame(rows).toDF("media_id", "payload")
      df.select(col("media_id"),
          M.imageMeta(col("payload")).getField("format").as("format"),
          M.imageMeta(col("payload")).getField("width").as("width"),
          M.imageMeta(col("payload")).getField("height").as("height"),
          M.pixelStats(col("payload")).getField("meanR").as("mean_r"),
          M.pixelStats(col("payload")).getField("meanG").as("mean_g"),
          M.pixelStats(col("payload")).getField("meanB").as("mean_b"))
        .orderBy(col("media_id"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m01_image_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,
         CAST(mean_b AS DOUBLE) AS mean_b FROM (VALUES
         (1, 'png', 31, 17, 64.0, 96.0, 128.0),
         (2, 'gif', 12, 34, 255.0, 0.0, 0.0),
         (3, 'bmp', 8, 9, 16.0, 32.0, 48.0),
         (4, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, format, width, height, mean_r, mean_g, mean_b)
         ORDER BY media_id""",
  )
}
