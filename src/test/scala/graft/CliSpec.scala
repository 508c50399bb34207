package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** CLI session spec: apply → list → describe → get across invocations
  * sharing only the on-disk state dir (the reference's
  * submit-then-read-path session, SURVEY §3.1 step 9 / §3.3). */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("apply/list/describe/get round-trip through the persisted log") {
    val dir = Files.createTempDirectory("graft-cli").toString
    val state = s"$dir/state"
    Files.writeString(Paths.get(s"$dir/fruit.txt"),
      Seq("apple", "kiwi", "cherry", "kiwi is delicious")
        .mkString("", "\n", "\n"))
    val spec =
      s"""{"apiVersion": "v1alpha1", "engine_name": "docker",
         |  "verifier_name": "ipfs",
         |  "job_spec_docker": {"image": "ubuntu",
         |    "entrypoint": ["grep", "kiwi", "/data/file.txt"]},
         |  "inputs": [{"engine_name": "ipfs", "name": "in",
         |    "cid": "$dir/fruit.txt", "path": "/data/file.txt"}],
         |  "deal": {"concurrency": 2}}""".stripMargin
    Files.writeString(Paths.get(s"$dir/job.json"), spec)

    assert(Cli.run(Seq("apply", "-f", s"$dir/job.json",
      "--state-dir", state), spark) === 0)
    // separate invocation: state reloaded from disk
    assert(Cli.run(Seq("list", "--state-dir", state), spark) === 0)
    val log = Cli.loadEvents(state)
    val jobId = log.all.head.jobId
    assert(log.currentJobState(jobId).get.state === jobs.Lifecycle.State.Complete)
    assert(Cli.run(Seq("describe", jobId.take(8), "--state-dir", state),
      spark) === 0)
    assert(Cli.run(Seq("get", jobId.take(8), s"$dir/fetched",
      "--state-dir", state), spark) === 0)
    val fetched = spark.read.parquet(s"$dir/fetched/$jobId/r0")
    assert(fetched.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("kiwi", "kiwi is delicious"))
    // unknown id and bad usage fail with nonzero codes
    assert(Cli.run(Seq("describe", "zzzzzz", "--state-dir", state), spark) === 1)
    assert(Cli.run(Seq("bogus"), spark) === 2)
  }
}
