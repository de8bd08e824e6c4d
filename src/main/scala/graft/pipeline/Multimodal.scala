package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real and tested: a `binary` column flows
  * through `mapPartitions` in batches, producing a typed struct row
  * per asset — exactly the schema/partitioning/batch shape an
  * image/audio decode stage needs. IMAGE payloads (PNG/JPEG/BMP/GIF —
  * whatever the JDK's `javax.imageio` readers recognize) decode for
  * REAL: width/height/format come from the actual bytes via a
  * header-only ImageIO read. Payloads no reader recognizes (audio,
  * video, arbitrary blobs — this container has no native codecs)
  * fall back to a clearly-marked deterministic STUB that derives
  * fake metadata from the byte length; swap `stubDecode` for a codec
  * call (or a Pandas UDF via mapInPandas from PySpark) without
  * touching the plumbing.
  */
object Multimodal {

  /** Real image header decode via the JDK's ImageIO: width, height
    * and format name from the actual bytes, WITHOUT decoding pixel
    * data (reader.getWidth/getHeight are header reads — the right
    * cost model for a metadata pass over billions of assets). None
    * when no installed reader recognizes the payload. */
  private[pipeline] def imageDecode(bytes: Array[Byte]): Option[(Long, Long, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.getWidth(0).toLong, reader.getHeight(0).toLong,
            reader.getFormatName.toLowerCase))
        } catch {
          case _: java.io.IOException => None // truncated/corrupt header
        } finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** STUB decoder for codec-less payloads — deterministic fake
    * metadata from the payload bytes. A real deployment would plug an
    * audio/video demuxer here. */
  private[pipeline] def stubDecode(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val n = bytes.length.toLong
    val width = n % 640
    val height = (n * 7) % 480
    val frames = n % 30 + 1
    (n, width, height, frames)
  }

  /** Decode dispatch: real ImageIO metadata for recognized images
    * (single frame, real format name), stub otherwise. */
  private[pipeline] def decode(bytes: Array[Byte]): (Long, Long, Long, Long, String) =
    imageDecode(bytes) match {
      case Some((w, h, fmt)) => (bytes.length.toLong, w, h, 1L, fmt)
      case None =>
        val (n, w, h, f) = stubDecode(bytes)
        (n, w, h, f, "raw")
    }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("format", StringType)))

  /** Frame sampling over the decoded assets: every asset contributes
    * ceil(n_frames / 4) evenly-spaced frames (a video keyframe-sample
    * stage). The per-frame "content hash" is the deterministic stub
    * for the real frame decode. Pure Column pipeline: sequence +
    * explode, so the fan-out is distributed and codegen'd — the shape
    * a real frame extractor plugs into. */
  def frameSample(spark: SparkSession, dir: String, everyNth: Int = 4): DataFrame = {
    decodeMeta(spark, dir)
      .withColumn("step", greatest(ceil(col("n_frames") / everyNth).cast("long"), lit(1L)))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id"), lit(":"), col("frame_idx"))).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")
  }

  val featureDim = 16

  /** STUB feature extractor — a deterministic 16-dim embedding from
    * the payload's byte histogram (occurrences of bytes 'a'..'p',
    * normalized by payload length). Real implementation would run a
    * vision/audio encoder over the decoded asset; the batch shape
    * (per-partition iterator, fixed-dim float vector out) is what that
    * encoder plugs into. */
  private[pipeline] def stubFeatures(bytes: Array[Byte]): Array[Double] = {
    val counts = new Array[Double](featureDim)
    var i = 0
    while (i < bytes.length) {
      val j = bytes(i) - 'a'.toByte
      if (j >= 0 && j < featureDim) counts(j) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    counts.map(c => c / n)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Feature extraction over binary payloads: mapPartitions → fixed-
    * dim vector per asset. The output column is the same
    * `array<double>` shape [[Similarity]] consumes, so extracted
    * features flow straight into ANN / dedup (embedding-cosine
    * near-dup over decoded assets = this + `Dedup.embeddingPairs`). */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    val payloads = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    payloads.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), stubFeatures(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
  }

  /** Aspect-preserving resize planning over the decoded metadata (the
    * geometry stage of an image-resize operator — the pixel work is
    * the stubbed decode): fit each asset into a `box` x `box` square,
    * never upscaling. Pure integer/double Column arithmetic. */
  def resizeMeta(spark: SparkSession, dir: String, box: Int = 224): DataFrame =
    decodeMeta(spark, dir)
      .withColumn("scale",
        when(col("width") > 0 && col("height") > 0,
          least(lit(box.toDouble) / col("width"), lit(box.toDouble) / col("height"), lit(1.0)))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("long").as("out_w"),
        floor(col("height") * col("scale")).cast("long").as("out_h"))
      .orderBy("doc_id")

  /** Treats each document's text bytes as an opaque binary payload and
    * runs the per-partition decode pipeline over it. */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    val payloads = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    val decoded = payloads.mapPartitions { rows =>
      // batch shape: one iterator pass per partition, no per-row task
      rows.map { r =>
        val id = r.getLong(0)
        val (n, w, h, f, fmt) = decode(r.getAs[Array[Byte]](1))
        Row(id, n, w, h, f, fmt)
      }
    }(enc)
    decoded.orderBy("doc_id")
  }

  /** Deterministic synthetic PNG: a `w` x `h` RGB image whose pixels
    * are a fixed function of their coordinates, encoded with the
    * JDK's PNG writer. Used to drive the REAL image-decode path with
    * genuine image bytes in environments (like this one) whose test
    * corpus has no binary image columns. */
  private[pipeline] def syntheticPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = (x * 31 + y * 7) & 0xFFFFFF; x += 1 }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w) // bulk raster write, not per-pixel
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Memo cache for [[syntheticPng]]: the entry's dimension domain is
    * 64 x 48 pairs, so each executor JVM encodes every distinct size
    * once instead of once per row — ImageIO writer setup dominates
    * the encode at ~1 ms per call. Bounded by the distinct-size
    * count; the bytes are a pure function of (w, h). */
  private val pngCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()
  private def syntheticPngCached(w: Int, h: Int): Array[Byte] =
    pngCache.computeIfAbsent((w.toLong << 32) | h, _ => syntheticPng(w, h))

  /** End-to-end REAL image decode: synthesizes one PNG per document
    * (dimensions a fixed arithmetic function of doc metadata, so an
    * engine without ImageIO can still predict them), then recovers
    * width/height/format FROM THE BYTES via [[imageDecode]]. The
    * encode-then-decode round trip means a green result proves the
    * decoder reads real image headers, not the stub arithmetic (the
    * DECODE runs per row; only the fixture encoding is memoized). */
  def decodePngMeta(spark: SparkSession, dir: String): DataFrame = {
    val metaSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("format", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(metaSchema)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nc = r.getLong(1)
          val png = syntheticPngCached((nc % 64 + 1).toInt, (id % 48 + 1).toInt)
          decode(png) match {
            case (_, w, h, _, fmt) => Row(id, w, h, fmt)
          }
        }
      }(enc)
      .orderBy("doc_id")
  }
}
