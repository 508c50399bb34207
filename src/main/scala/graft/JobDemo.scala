package graft

import org.apache.spark.sql.SparkSession
import graft.jobs._
import java.nio.file.{Files, Paths}

/** End-to-end walkthrough of the job control plane — the Spark-native twin
  * of the reference's `docker run … && list && describe && get` session
  * (SURVEY §3.1/§3.3). Run: `sbt "runMain graft.JobDemo"`. */
object JobDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-demo").toString
    Files.writeString(Paths.get(s"$dir/fruit.txt"),
      Seq("apple", "banana", "kiwi", "cherry", "kiwi is delicious", "plum")
        .mkString("", "\n", "\n"))

    val runner = new Runner(spark)

    // -- submit a replicated grep job (docker-engine spec, compiled native)
    val spec = JobSpec(
      engine = "docker", verifier = "hash",
      docker = Some(JobSpecDocker(image = "ubuntu",
        entrypoint = Seq("grep", "kiwi", "/inputs/fruit.txt"))),
      resources = Resources.parse("500m", "100Mb"),
      inputs = Seq(StorageSpec(engine = "file", name = "in",
        path = s"$dir/fruit.txt")))
    val job = runner.submit(spec, JobDeal(concurrency = 2)) match {
      case Right(j) => println(s"submitted ${j.id}"); j
      case Left(e)  => sys.error(s"submit failed: $e")
    }

    val inputs = Map("/inputs/fruit.txt" ->
      SourceResolver.resolve(spark, spec.inputs.head))
    runner.run(job, inputs, s"$dir/out") match {
      case Right(res) =>
        println(s"replicas=${res.cids.size} verified=${res.verified}")
        println(s"cid=${res.cids.head.take(16)}…")
      case Left(e) => sys.error(s"run failed: $e")
    }

    // -- read path: list + describe + get
    println(s"list: ${runner.list().map(_.id.take(8)).mkString(", ")}")
    val desc = runner.describe(job.id).get
    println(s"describe: state=${desc.currentState} events=${desc.events.size} " +
      s"nodes=${desc.states.map(s => s"${s.nodeId}:${s.state}").sorted.mkString(",")}")
    val result = spark.read.parquet(s"$dir/out/${job.id}/r0")
    println("get (stdout analog):")
    result.collect().foreach(r => println(s"  ${r.getString(0)}"))
    println(s"manifest: ${Files.readString(Paths.get(s"$dir/out/${job.id}/r0/_manifest.json"))}")

    // -- probes: things that must be rejected, not executed
    def expectLeft(tag: String, r: Either[String, _]): Unit = r match {
      case Left(e)  => println(s"PROBE $tag rejected: $e")
      case Right(_) => sys.error(s"PROBE $tag was NOT rejected")
    }
    expectLeft("bad-volume", runner.submit(JobSpec(engine = "docker",
      docker = Some(JobSpecDocker(entrypoint = Seq("cat", "/x"))),
      inputs = Seq(StorageSpec(engine = "file", path = "")))))
    expectLeft("unknown-engine", runner.submit(JobSpec(engine = "wasm"))
      .flatMap(j => runner.run(j, Map.empty, s"$dir/out")))
    val ndJob = runner.submit(JobSpec(engine = "language",
      language = Some(JobSpecLanguage(command = "rand()",
        deterministic = true)))).toOption.get
    expectLeft("nondeterministic", runner.run(ndJob, inputs, s"$dir/out"))
    println(s"events total=${runner.events.all.size} " +
      s"errors=${runner.events.all.count(_.eventName == Lifecycle.EventType.Error)}")

    spark.stop()
  }
}
