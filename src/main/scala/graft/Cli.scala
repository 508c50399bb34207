package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
import graft.jobs._

/** CLI front-end — the reference's user surface (`apply -f`, `list`,
  * `describe`, `get`; cmd/bacalhau/{apply,list,describe,get}.go) over the
  * Spark-native control plane. State persists across invocations in a
  * JSONL event log + job catalog under `--state-dir` (default
  * `/tmp/graft-state`), replacing the reference's requester-node datastore
  * (pkg/localdb/inmemory) with an append-only file — same event-sourced
  * semantics, state is always re-derived by folding the log.
  *
  * Usage:
  *   graft.Cli apply -f spec.json [--state-dir DIR]
  *   graft.Cli list [-n N] [--state-dir DIR]
  *   graft.Cli describe <idPrefix> [--state-dir DIR]
  *   graft.Cli get <idPrefix> <outDir> [--state-dir DIR]
  */
object Cli {

  private val mapper = new ObjectMapper()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code = run(args.toSeq, spark)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Testable entry: returns an exit code instead of exiting. */
  def run(args: Seq[String], spark: SparkSession): Int = {
    val (flags, pos) = parseFlags(args)
    val stateDir = flags.getOrElse("state-dir", "/tmp/graft-state")
    Files.createDirectories(Paths.get(stateDir))
    pos match {
      case "apply" :: Nil if flags.contains("f") =>
        apply(spark, flags("f"), stateDir)
      case "list" :: Nil =>
        list(stateDir, flags.get("n").map(_.toInt).getOrElse(10))
      case "describe" :: id :: Nil => describe(stateDir, id)
      case "get" :: id :: out :: Nil => get(stateDir, id, out)
      case _ =>
        System.err.println(
          "usage: apply -f spec.json | list [-n N] | describe <id> | get <id> <outDir>")
        2
    }
  }

  private def parseFlags(args: Seq[String]): (Map[String, String], List[String]) = {
    var flags = Map.empty[String, String]
    var pos = List.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case f if f.startsWith("--") && i + 1 < args.length =>
          flags += (f.drop(2) -> args(i + 1)); i += 2
        case f if f.startsWith("-") && f.length == 2 && i + 1 < args.length =>
          flags += (f.drop(1) -> args(i + 1)); i += 2
        case p => pos :+= p; i += 1
      }
    }
    (flags, pos)
  }

  // ---- persistence: JSONL event log + job catalog -------------------

  private def eventToJson(e: JobEvent): String =
    mapper.writeValueAsString(mapper.createObjectNode()
      .put("jobId", e.jobId).put("clientId", e.clientId)
      .put("sourceNodeId", e.sourceNodeId).put("targetNodeId", e.targetNodeId)
      .put("eventName", e.eventName).put("status", e.status)
      .put("resultsId", e.resultsId).put("eventTimeUs", e.eventTimeUs))

  private def appendLines(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** Rebuild the event log by replaying the JSONL file (state is derived,
    * never stored — reference controller semantics). */
  def loadEvents(stateDir: String): EventLog = {
    val log = new EventLog
    val p = Paths.get(s"$stateDir/events.jsonl")
    if (Files.exists(p)) {
      Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        log.append(JobEvent(
          jobId = n.get("jobId").asText(),
          clientId = n.get("clientId").asText(),
          sourceNodeId = n.get("sourceNodeId").asText(),
          targetNodeId = n.get("targetNodeId").asText(),
          eventName = n.get("eventName").asText(),
          status = n.get("status").asText(),
          resultsId = n.get("resultsId").asText(),
          eventTimeUs = n.get("eventTimeUs").asLong()))
      }
    }
    log
  }

  private def loadJobs(stateDir: String): Seq[(String, String, Long)] = {
    val p = Paths.get(s"$stateDir/jobs.jsonl")
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      (n.get("id").asText(), n.get("engine").asText(),
        n.get("createdAtMs").asLong())
    }.toSeq
  }

  private def resolveJobId(stateDir: String, idPrefix: String): Option[String] = {
    val norm = idPrefix.replace("-", "").toLowerCase
    loadJobs(stateDir).map(_._1)
      .find(_.replace("-", "").toLowerCase.startsWith(norm))
  }

  // ---- commands -----------------------------------------------------

  private def apply(spark: SparkSession, specFile: String,
                    stateDir: String): Int =
    JobSpecLoader.fromFile(specFile) match {
      case Left(err) => System.err.println(s"apply: $err"); 1
      case Right((spec, deal)) =>
        val runner = new Runner(spark)
        runner.submit(spec, deal) match {
          case Left(err) => System.err.println(s"submit: $err"); 1
          case Right(job) =>
            val inputs = spec.inputs.map(v =>
              v.path -> SourceResolver.resolve(spark, v)).toMap
            val outDir = s"$stateDir/results"
            val code = runner.run(job, inputs, outDir) match {
              case Right(res) =>
                println(s"${job.id} verified=${res.verified} " +
                  s"replicas=${res.cids.size} cid=${res.cids.head.take(16)}")
                0
              case Left(err) =>
                System.err.println(s"run: $err"); 1
            }
            appendLines(s"$stateDir/jobs.jsonl", Seq(
              mapper.writeValueAsString(mapper.createObjectNode()
                .put("id", job.id).put("engine", spec.engine)
                .put("createdAtMs", job.createdAt.toEpochMilli))))
            appendLines(s"$stateDir/events.jsonl",
              runner.events.all.map(eventToJson))
            code
        }
    }

  private def list(stateDir: String, n: Int): Int = {
    val log = loadEvents(stateDir)
    loadJobs(stateDir).sortBy(-_._3).take(n).foreach { case (id, engine, ts) =>
      val st = log.currentJobState(id).map(_.state).getOrElse("Unknown")
      println(s"${id.take(8)}  $engine  $st  ${java.time.Instant.ofEpochMilli(ts)}")
    }
    0
  }

  private def describe(stateDir: String, idPrefix: String): Int =
    resolveJobId(stateDir, idPrefix) match {
      case None => System.err.println(s"describe: no job $idPrefix"); 1
      case Some(id) =>
        val log = loadEvents(stateDir)
        println(s"job: $id")
        println(s"state: ${log.currentJobState(id).map(_.state).getOrElse("Unknown")}")
        log.states.values.filter(_.jobId == id).toSeq.sortBy(_.nodeId)
          .foreach(s => println(
            s"  node ${s.nodeId}: ${s.state} results=${s.resultsId.take(16)}"))
        log.forJob(id).foreach(e =>
          println(s"  event ${e.eventTimeUs} ${e.eventName} ${e.status}"))
        0
    }

  private def get(stateDir: String, idPrefix: String, outDir: String): Int =
    resolveJobId(stateDir, idPrefix) match {
      case None => System.err.println(s"get: no job $idPrefix"); 1
      case Some(id) =>
        val src = Paths.get(s"$stateDir/results/$id")
        if (!Files.exists(src)) { System.err.println("get: no results"); 1 }
        else {
          val dst = Paths.get(outDir, id)
          Files.walk(src).iterator().asScala.foreach { p =>
            val t = dst.resolve(src.relativize(p))
            if (Files.isDirectory(p)) Files.createDirectories(t)
            else { Files.createDirectories(t.getParent); Files.copy(p, t) }
          }
          println(s"fetched ${src} -> ${dst}")
          0
        }
    }
}
