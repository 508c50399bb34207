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

  /** http(s) fetching is opt-in (`-Dgraft.allow.http=true` or env
    * `GRAFT_ALLOW_HTTP=1`) — this build targets a zero-egress sandbox, so
    * the default refuses remote URLs instead of hanging on a dead network. */
  private def httpAllowed: Boolean =
    sys.props.get("graft.allow.http").orElse(sys.env.get("GRAFT_ALLOW_HTTP"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  /** Driver-side URL fetch to a content-addressed scratch (reference:
    * urldownload PrepareStorage GETs to a temp file and bind-mounts it —
    * pkg/storage/url/urldownload/storage.go:65-94; the cache-keyed-by-URL
    * skip mirrors ipfs_apicopy's re-download skip, storage.go:120-134).
    * Idempotent: the same URL resolves to the same local path and is
    * fetched at most once per scratch lifetime.
    *
    * Transient failures (connect/read IO errors, HTTP 429/5xx) retry with
    * exponential backoff — a flaky remote server costs retries, not the
    * job. Definite failures (other non-200 codes) abort immediately. */
  private[jobs] var fetchAttempts = 3
  private[jobs] var fetchBackoffMs = 250L

  private def fetchUrl(url: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val key = md.digest(url.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val uriPath = java.net.URI.create(url).getPath
    val base = uriPath.substring(uriPath.lastIndexOf('/') + 1) match {
      case "" => "download"
      case n  => n
    }
    val target = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-url-cache", key, base)
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(target.getParent)
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(60)).GET().build()
      var attempt = 0
      var delayMs = fetchBackoffMs
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt < fetchAttempts) {
        attempt += 1
        val tmp = java.nio.file.Files.createTempFile(target.getParent, ".part", "")
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofFile(tmp))
          resp.statusCode() match {
            case 200 =>
              java.nio.file.Files.move(tmp, target,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              done = true
            case code if code == 429 || code >= 500 => // transient: retry
              java.nio.file.Files.deleteIfExists(tmp)
              lastErr = new java.io.IOException(
                s"urldownload: GET $url -> $code (attempt $attempt)")
            case code => // definite (404, 403, ...): no retry
              java.nio.file.Files.deleteIfExists(tmp)
              throw new IllegalArgumentException(
                s"urldownload: GET $url -> $code")
          }
        } catch {
          case e: InterruptedException =>
            java.nio.file.Files.deleteIfExists(tmp)
            Thread.currentThread().interrupt()
            throw e
          case e: java.io.IOException =>
            java.nio.file.Files.deleteIfExists(tmp)
            lastErr = e
        }
        if (!done && attempt < fetchAttempts) {
          Thread.sleep(delayMs)
          delayMs *= 2
        }
      }
      if (!done)
        throw new java.io.IOException(
          s"urldownload: $url failed after $fetchAttempts attempts", lastErr)
    }
    target.toString
  }

  private def resolvePath(spec: StorageSpec): String =
    spec.engine match {
      case "urldownload" =>
        val u = spec.url
        if (u.startsWith("file://")) u.stripPrefix("file://")
        else if ((u.startsWith("http://") || u.startsWith("https://")) &&
                 httpAllowed) fetchUrl(u)
        else throw new IllegalArgumentException(
          s"urldownload: http(s) fetch disabled (set graft.allow.http=true); " +
            s"got '$u'")
      case _ => if (spec.cid.nonEmpty) spec.cid else spec.path
    }

  def resolve(spark: SparkSession, spec: StorageSpec): DataFrame = {
    val path = resolvePath(spec)
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
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
