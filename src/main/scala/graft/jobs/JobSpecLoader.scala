package graft.jobs

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** `apply -f job.json` front-end (SURVEY.md §3.3; reference:
  * cmd/bacalhau/apply.go:60-176 — file → spec struct → the same submit
  * path). Accepts the reference's published spec-file field names
  * (testdata/job.json: `engine_name`, `verifier_name`, `job_spec_docker`,
  * `job_spec_language`, `resources`, `inputs`/`outputs` with
  * `engine_name/name/cid/path`, `annotations`) and maps them onto the
  * [[JobSpec]] ADT. JSON only — YAML specs convert losslessly to JSON and
  * the container ships no YAML parser; jackson is already on Spark's
  * classpath.
  */
object JobSpecLoader {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): Either[String, (JobSpec, JobDeal)] =
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) Left("not a JSON object")
      else parse(root).flatMap { case (spec, deal) =>
        spec.validate().map(v => (v, deal))
      }
    } catch {
      case e: Exception => Left(s"invalid JSON: ${e.getMessage}")
    }

  def fromFile(path: String): Either[String, (JobSpec, JobDeal)] =
    try fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => Left(s"cannot read $path: ${e.getMessage}") }

  private def str(n: JsonNode, field: String, default: String = ""): String = {
    val v = n.get(field)
    if (v == null || v.isNull) default else v.asText()
  }

  private def strSeq(n: JsonNode, field: String): Seq[String] = {
    val v = n.get(field)
    if (v == null || !v.isArray) Nil
    else v.elements().asScala.map(_.asText()).toSeq
  }

  private def volumes(n: JsonNode, field: String): Seq[StorageSpec] = {
    val v = n.get(field)
    if (v == null || !v.isArray) Nil
    else v.elements().asScala.map { e =>
      // reference storage engines (ipfs/urldownload) resolve through the
      // shared-filesystem source in this engine (SourceResolver)
      val eng = str(e, "engine_name") match {
        case "urldownload" => "urldownload"
        case _             => "file"
      }
      StorageSpec(engine = eng, name = str(e, "name"), cid = str(e, "cid"),
        url = str(e, "url"), path = str(e, "path"))
    }.toSeq
  }

  private def parse(root: JsonNode): Either[String, (JobSpec, JobDeal)] = {
    val engine = str(root, "engine_name") match {
      case "docker"   => "docker"
      case "language" => "language"
      case "noop"     => "noop"
      case other      => return Left(s"unknown engine_name: '$other'")
    }
    val verifier = str(root, "verifier_name") match {
      case "ipfs"       => "hash" // CID-publish analog
      case "noop" | ""  => "noop"
      case other        => return Left(s"unknown verifier_name: '$other'")
    }
    val docker = Option(root.get("job_spec_docker")).filter(_.isObject).map { d =>
      JobSpecDocker(
        image = str(d, "image"),
        entrypoint = strSeq(d, "entrypoint"),
        env = strSeq(d, "env"),
        workingDir = str(d, "working_dir"))
    }
    val language = Option(root.get("job_spec_language")).filter(_.isObject).map { l =>
      JobSpecLanguage(
        language = str(l, "language", "sql"),
        languageVersion = str(l, "language_version", "ansi"),
        deterministic = {
          val v = l.get("deterministic"); v == null || v.asBoolean(true)
        },
        command = str(l, "command"))
    }
    val resources = Option(root.get("resources")).filter(_.isObject)
      .map { r =>
        try Right(Resources.parse(str(r, "cpu"), str(r, "memory"),
          str(r, "disk"), str(r, "gpu")))
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
      }.getOrElse(Right(ResourceUsage())) match {
        case Left(err) => return Left(s"bad resources: $err")
        case Right(r)  => r
      }
    val deal = Option(root.get("deal")).filter(_.isObject)
      .map(d => JobDeal(math.max(1,
        Option(d.get("concurrency")).map(_.asInt(1)).getOrElse(1))))
      .getOrElse(JobDeal())
    Right((JobSpec(
      engine = engine,
      verifier = verifier,
      docker = docker,
      language = language,
      resources = resources,
      inputs = volumes(root, "inputs"),
      outputs = volumes(root, "outputs"),
      annotations = strSeq(root, "annotations")), deal))
  }
}
