package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed metadata
  * (SURVEY.md §7 M5 / reference B8 — DESIGN.md:69-74 image downscaling,
  * examples/image_downscaling/).
  *
  * Design: media files load through Spark's `binaryFile` source (one row per
  * file: path, modificationTime, length, content), transforms run as typed
  * `mapPartitions` over the content bytes — the Scala analog of
  * mapInPandas-batched UDFs: per-partition iterator, no per-row JVM↔native
  * round-trips, executor-side only (never collect).
  *
  * IMAGE DECODE IS REAL: [[decodeDims]] and [[resize]] run `javax.imageio`
  * (pure-JVM PNG/BMP/GIF/JPEG codecs, headless-safe — no native libraries),
  * so the reference's image-downscale scenario produces actual pixels.
  * Audio/video decode would need codecs this container lacks; those kinds
  * fall back to deterministic byte-level stand-ins ([[resizeStub]]
  * byte-striding), with the schema/partitioning/batch shape identical so a
  * codec drop-in reuses the plumbing unchanged.
  *
  * Scale notes: binaryFile splits per-file (a file is the atom), so a 100 TB
  * corpus of 10 MB images parallelizes to ~10M tasks bounded by
  * `spark.sql.files.maxPartitionBytes` bin-packing; `pathGlobFilter` prunes
  * at listing time; all transforms are narrow (no shuffle).
  */
object Multimodal {

  // imageio/AWT raster ops are headless-safe; assert headless so executor
  // JVMs never attempt a display connection
  java.lang.System.setProperty("java.awt.headless", "true")

  /** One decoded-metadata row per media file. */
  final case class MediaMeta(
      path: String,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** One row per sampled frame (video/audio chunking). */
  final case class Frame(
      path: String,
      frame_idx: Int,
      n_bytes: Int,
      checksum: Long)

  /** Byte-level feature vector per file. */
  final case class ByteFeatures(
      path: String,
      n_bytes: Long,
      mean: Double,
      histogram: Array[Long])

  /** Load a directory of media files as binary rows. */
  def readAssets(spark: SparkSession, dir: String,
                 glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Media kind from the file extension (the only public signal available
    * without decoding). */
  def kindOf(path: String): String = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "png" | "jpg" | "jpeg" | "gif" | "bmp" => "image"
      case "wav" | "mp3" | "flac" | "ogg"         => "audio"
      case "mp4" | "mkv" | "avi" | "webm"         => "video"
      case _                                      => "binary"
    }
  }

  /** Real image decode: dimensions via javax.imageio (reads only the
    * header for registered formats). (0, 0) for bytes no installed codec
    * understands — the caller distinguishes "not an image" from "decoded". */
  def decodeDims(content: Array[Byte]): (Int, Int) = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) (0, 0)
      else {
        val r = readers.next()
        try { r.setInput(in); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      }
    } catch { case _: Exception => (0, 0) }
    finally in.close()
  }

  /** Decode/inspect each file → typed metadata. Batched per partition;
    * decode happens executor-side inside the iterator (never collect). */
  def extractMeta(assets: DataFrame, frameBytes: Int = 4096): Dataset[MediaMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("path", "length", "content")
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, len, content) =>
          val (w, h) = decodeDims(content)
          val frames = ((len + frameBytes - 1) / frameBytes).toInt
          MediaMeta(path, kindOf(path), len, w, h, frames)
        }
      }
  }

  /** Frame sampling: chunk content into fixed-size frames, one output row
    * per frame (the video-frame / audio-window sampling shape). Narrow
    * per-file flatMap — each file's frames stay on its executor. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 4096,
                   every: Int = 1): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(frameBytes > 0 && every > 0)
    assets.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val n = (content.length + frameBytes - 1) / frameBytes
        (0 until n by every).iterator.map { i =>
          val lo = i * frameBytes
          val hi = math.min(lo + frameBytes, content.length)
          var sum = 0L
          var j = lo
          while (j < hi) { sum = sum * 31 + (content(j) & 0xff); j += 1 }
          Frame(path, i, hi - lo, sum)
        }
      }
  }

  /** Byte-histogram features (the real part of "feature extraction": a
    * 256-bin histogram + mean over raw bytes, computed with primitive
    * arrays inside the partition iterator). */
  def byteFeatures(assets: DataFrame): Dataset[ByteFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, content) =>
          val hist = new Array[Long](256)
          var sum = 0L
          var i = 0
          while (i < content.length) {
            val b = content(i) & 0xff
            hist(b) += 1
            sum += b
            i += 1
          }
          val mean =
            if (content.length == 0) 0.0 else sum.toDouble / content.length
          ByteFeatures(path, content.length.toLong, mean, hist)
        }
      }
  }

  /** Real image downscale (reference scenario B8, DESIGN.md:69-74): decode
    * → area-averaging rescale to (w/factor, h/factor) → re-encode PNG. A
    * binary-in → binary-out narrow column transform; each image decodes and
    * re-encodes on its executor. Bytes that no codec reads fall back to
    * [[resizeStub]] byte-striding so opaque blobs still shrink
    * deterministically. */
  def resize(assets: DataFrame, factor: Int): Dataset[(String, Array[Byte])] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(factor >= 1)
    assets.select("path", "content").as[(String, Array[Byte])]
      .map { case (path, content) => (path, resizeBytes(content, factor)) }
  }

  /** Per-file downscale kernel (exposed for unit tests). */
  def resizeBytes(content: Array[Byte], factor: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < factor || img.getHeight < factor)
      strideBytes(content, factor)
    else {
      val w = math.max(1, img.getWidth / factor)
      val h = math.max(1, img.getHeight / factor)
      val scaled = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        // synchronous scale of the BufferedImage source. (The
        // getScaledInstance form is ASYNC — drawImage(toolkitImage) can
        // return before pixels are produced, yielding a blank raster
        // nondeterministically, which would also break replica
        // hash-agreement.)
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", out)
      out.toByteArray
    }
  }

  /** Byte-striding stand-in for kinds with no installed codec (audio/video):
    * keeps every `factor`-th byte. Same call shape as the real path. */
  def resizeStub(assets: DataFrame, factor: Int): Dataset[(String, Array[Byte])] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(factor >= 1)
    assets.select("path", "content").as[(String, Array[Byte])]
      .map { case (path, content) => (path, strideBytes(content, factor)) }
  }

  private def strideBytes(content: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((content.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = content(i * factor); i += 1 }
    out
  }
}
