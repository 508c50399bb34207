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
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[decodeDimsStub]] derives deterministic fake dimensions from the leading
  * bytes, and [[resizeStub]] "resamples" by byte-striding. Every other part —
  * the source schema, the partitioning, the typed batch shape, frame
  * chunking, histogram feature extraction — is real Spark plumbing that a
  * codec drop-in would reuse unchanged (swap the stub body for libjpeg/ffmpeg
  * bindings).
  *
  * Scale notes: binaryFile splits per-file (a file is the atom), so a 100 TB
  * corpus of 10 MB images parallelizes to ~10M tasks bounded by
  * `spark.sql.files.maxPartitionBytes` bin-packing; `pathGlobFilter` prunes
  * at listing time; all transforms are narrow (no shuffle).
  */
object Multimodal {

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

  /** STUB decoder: deterministic fake dimensions from the first two content
    * bytes (no codecs in this container). A real build replaces this body
    * with an actual header parse; the call sites don't change. */
  def decodeDimsStub(content: Array[Byte]): (Int, Int) =
    if (content.length < 2) (0, 0)
    else (1 + (content(0) & 0x7f), 1 + (content(1) & 0x7f))

  /** Decode/inspect each file → typed metadata. Batched per partition. */
  def extractMeta(assets: DataFrame, frameBytes: Int = 4096): Dataset[MediaMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("path", "length", "content")
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, len, content) =>
          val (w, h) = decodeDimsStub(content)
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

  /** STUB resize: byte-striding stand-in for pixel resampling (keeps every
    * `factor`-th byte). Real plumbing: binary-in → binary-out column
    * transform, the downscale job shape from DESIGN.md:69-74. */
  def resizeStub(assets: DataFrame, factor: Int): Dataset[(String, Array[Byte])] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(factor >= 1)
    assets.select("path", "content").as[(String, Array[Byte])]
      .map { case (path, content) =>
        val out = new Array[Byte]((content.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = content(i * factor); i += 1 }
        (path, out)
      }
  }
}
