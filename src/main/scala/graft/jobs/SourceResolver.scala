package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** StorageSpec → DataFrame (reference: storage providers —
  * ipfs_apicopy PrepareStorage pkg/storage/ipfs_apicopy/storage.go:87-143,
  * urldownload pkg/storage/url/urldownload/storage.go:65-94).
  *
  * The reference fetches bytes next to the job and bind-mounts them; Spark
  * reads through the filesystem connector directly, so "prepare storage"
  * degenerates to choosing a reader. Format is inferred from the extension
  * (the reference is schema-on-read: bytes until a tool imposes structure —
  * SURVEY §1.3); unknown extensions read as opaque lines, binary blobs via
  * `binaryFile` (one row per file: path, modificationTime, length, content).
  *
  * Scale: all readers are plain `spark.read` — file listing, split planning
  * and partition pruning stay with Spark's FileIndex, so a "volume" can be
  * a single file or a 100 TB directory tree without code changes.
  */
object SourceResolver {

  /** Locality probe (reference: HasStorageLocally,
    * pkg/storage/ipfs_apicopy/storage.go:60-64). */
  def hasStorageLocally(spec: StorageSpec): Boolean =
    new java.io.File(resolvePath(spec)).exists()

  /** Volume size for admission control (reference: GetVolumeSize,
    * pkg/storage/ipfs_apicopy/storage.go:67-85 — 0 when unknown). */
  def volumeSize(spec: StorageSpec): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    val f = new java.io.File(resolvePath(spec))
    if (f.exists()) walk(f) else 0L
  }

  private def resolvePath(spec: StorageSpec): String =
    spec.engine match {
      case "urldownload" =>
        // zero-egress environment: only file:// URLs resolve; http(s) would
        // be a driver-side fetch to scratch in a connected deployment.
        val u = spec.url
        if (u.startsWith("file://")) u.stripPrefix("file://")
        else throw new IllegalArgumentException(
          s"urldownload: only file:// supported in this environment, got '$u'")
      case _ => if (spec.cid.nonEmpty) spec.cid else spec.path
    }

  def resolve(spark: SparkSession, spec: StorageSpec): DataFrame = {
    val path = resolvePath(spec)
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (lower.endsWith(".json")) spark.read.json(path)
    else if (lower.endsWith(".txt") || lower.endsWith(".log"))
      spark.read.text(path)
    else if (lower.endsWith(".bin") || lower.endsWith(".png") ||
             lower.endsWith(".jpg") || lower.endsWith(".wav"))
      spark.read.format("binaryFile").load(path)
    else spark.read.text(path)
  }
}
