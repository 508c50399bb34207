package graft.jobs

import org.apache.spark.sql.DataFrame
import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Result publishing + content addressing (reference: the ipfs verifier
  * publishes the results folder and returns its CID —
  * pkg/verifier/ipfs/verifier.go:37-43; results folder layout —
  * pkg/executor/docker/executor.go:295-338).
  *
  * Spark-native: write the DataFrame, then derive a deterministic content
  * id — an order-independent executor-side combine of per-row digests (see
  * [[contentId]]) — plus a `_manifest.json` carrying rows/schema (the
  * stdout/exitCode analog).
  *
  * Determinism note (SURVEY §7 hard part (a)): part-file names and row
  * order vary run to run, so the digest hashes a canonical row encoding
  * (sorted), not raw parquet bytes. Two replicated runs of a deterministic
  * plan therefore hash equal even when Spark splits parts differently.
  */
object ResultPublisher {

  trait Publisher {
    def publish(df: DataFrame, outDir: String): String
  }

  /** noop verifier analog (pkg/verifier/noop/verifier.go:68-70): write,
    * return the path unchanged. */
  object Noop extends Publisher {
    def publish(df: DataFrame, outDir: String): String = {
      // a schema-less result (noop executor) publishes an empty folder —
      // parquet cannot encode zero columns
      if (df.columns.isEmpty) Files.createDirectories(Paths.get(outDir))
      else df.write.mode("overwrite").parquet(outDir)
      outDir
    }
  }

  /** hash verifier ("CID" analog): write + manifest + canonical digest.
    *
    * Single-pass (VERDICT r1 "what's wrong" #1): the source plan executes
    * exactly ONCE (the write); rows + digest both come from one aggregation
    * over the parquet actually written — so the CID attests the published
    * bytes, not a recomputation that could diverge, and an expensive query
    * is never paid twice (let alone 3×) per replica. */
  object Hash extends Publisher {
    def publish(df: DataFrame, outDir: String): String = {
      if (df.columns.isEmpty) { // schema-less noop result: empty folder CID
        Files.createDirectories(Paths.get(outDir))
        val cid = directoryId(outDir)
        Files.writeString(Paths.get(outDir, "_manifest.json"),
          s"""{"rows": 0, "schema": "", "cid": "$cid"}""")
        return cid
      }
      df.write.mode("overwrite").parquet(outDir)
      val written = df.sparkSession.read.parquet(outDir)
      val (cid, rows) = contentIdWithCount(written)
      val manifest =
        s"""{"rows": $rows, "schema": "${written.schema.simpleString}", "cid": "$cid"}"""
      Files.writeString(Paths.get(outDir, "_manifest.json"), manifest)
      cid
    }
  }

  /** Canonical content id of a DataFrame: per-row SHA-256 digests combined
    * with an order-independent executor-side aggregate — the 256-bit digest
    * splits into four 64-bit lanes, each lane XOR-combined (`bit_xor` is
    * associative+commutative, so map-side partials merge in any partition
    * order), plus the row count, then one driver-side SHA-256 over that
    * tiny summary.
    *
    * Properties: row-order independent (replicas with different partition
    * layouts hash equal), fully distributed (ONE summary row reaches the
    * driver — works at any output size), detects any single-row change.
    * Tradeoff vs hashing the sorted digest sequence: XOR combination is
    * weaker against *adversarial* collisions; the verifier guards against
    * nondeterminism between trusted replicas (A12), not hostile nodes —
    * the reference's v0 verifier doesn't even compare (DESIGN.md:95-99). */
  def contentId(df: DataFrame): String = contentIdWithCount(df)._1

  /** [[contentId]] plus the row count — both from the SAME single
    * aggregation (the count is already a lane of the digest summary). */
  def contentIdWithCount(df: DataFrame): (String, Long) = {
    import org.apache.spark.sql.functions._
    val hashed = df
      .select(sha2(to_json(struct(df.columns.toIndexedSeq.map(col): _*)), 256).as("h"))
    // eight 32-bit lanes (8 hex chars each — always fits a signed long),
    // combined two ways: XOR and SUM. Both are order-independent; together
    // they close XOR's paired-duplicate cancellation ({a,a,b} vs {c,c,b})
    // and SUM's additive rearrangements.
    val lane = (i: Int) =>
      conv(substring(col("h"), i * 8 + 1, 8), 16, 10).cast("long")
    val aggs = (0 until 8).map(i => bit_xor(lane(i)).as(s"x$i")) ++
      // decimal(38,0) sums: 32-bit lanes × up to ~1e28 rows without the
      // ANSI bigint-overflow error a long sum would hit at extreme scale
      (0 until 8).map(i => sum(lane(i).cast("decimal(38,0)")).as(s"s$i"))
    val row = hashed.agg(count(lit(1)).as("n"), aggs: _*).head()
    val summary = (0 to 16).map(i => row.get(i)).mkString(":")
    val md = MessageDigest.getInstance("SHA-256")
    md.update(summary.getBytes("UTF-8"))
    (md.digest().map("%02x".format(_)).mkString, row.getLong(0))
  }

  /** Directory digest (for published folders of arbitrary files). Keys each
    * file by its path RELATIVE to the root — so the digest distinguishes
    * layouts (`a/x.txt` vs `b/x.txt`), and duplicate base names in
    * different subdirs sort deterministically regardless of filesystem
    * traversal order (the idempotent context pin depends on this). */
  def directoryId(dir: String): String = {
    def files(f: File): Seq[File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq.flatMap(files)).getOrElse(Nil)
    val root = Paths.get(dir)
    val md = MessageDigest.getInstance("SHA-256")
    files(new File(dir))
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .map(f => root.relativize(f.toPath).toString
        .replace(File.separatorChar, '/') ->
        sha256(Files.readAllBytes(f.toPath)))
      .sortBy(_._1)
      .foreach { case (n, h) => md.update(s"$n:$h\n".getBytes("UTF-8")) }
    md.digest().map("%02x".format(_)).mkString
  }

  private def sha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
}
