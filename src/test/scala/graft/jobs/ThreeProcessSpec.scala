package graft.jobs

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Full devstack parity (VERDICT r4 "Next round" #4): the reference
  * concurrency test runs THREE nodes and a Concurrency=2 deal, asserting
  * the terminal multiset {2 Complete, 1 Cancelled}
  * (pkg/test/devstack/concurrency_test.go:46-105 over
  * pkg/devstack/devstack.go:54-258). Here three REAL `Cli serve` JVMs
  * share a --cluster-dir file bus; this process is the client, driving
  * node-a's HTTP API only. Unlike TwoProcessSpec (one serve process
  * simulating slots), every node here bids from its own process and the
  * two accepted nodes execute on separate SparkSessions — so the equal
  * results_id assertion is genuine cross-process replica verification
  * (A12), not a re-read of one execution.
  */
class ThreeProcessSpec extends AnyFunSuite {

  private def spawnServe(dir: String, clusterDir: String, nodeId: String,
                         port: Int): Process = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(
      sys.props("java.home") + "/bin/java",
      "-Xmx2g", "-cp", sys.props("java.class.path")) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "graft.Cli", "serve",
      "--api-port", port.toString,
      "--serve-ms", "180000",
      "--cluster-dir", clusterDir,
      "--node-id", nodeId,
      "--state-dir", s"$dir/state-$nodeId")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_MASTER", "local[2]")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(s"$dir/serve-$nodeId.log"))
    pb.start()
  }

  /** The bound ephemeral port, parsed from the serve log's
    * "listening on http://host:port" line. Each JVM binds port 0 itself,
    * so there is NO probe-then-rebind race with other processes on the
    * machine (the old freePorts() pattern flaked exactly that way). */
  private def portFromLog(dir: String, nodeId: String, proc: Process,
                          deadline: Long): Int = {
    val log = Paths.get(s"$dir/serve-$nodeId.log")
    val re = raw"listening on http://[^:]+:(\d+)".r
    while (System.currentTimeMillis() < deadline) {
      val text = if (Files.exists(log)) Files.readString(log) else ""
      re.findFirstMatchIn(text) match {
        case Some(m) => return m.group(1).toInt
        case None =>
          assert(proc.isAlive, s"serve $nodeId died: ${text.takeRight(2000)}")
          Thread.sleep(250)
      }
    }
    fail(s"serve $nodeId never reported its port")
  }

  test("3-node devstack: Concurrency=2 ends {2 Complete, 1 Cancelled}, replicas agree") {
    val dir = Files.createTempDirectory("graft-3p").toString
    val cluster = s"$dir/cluster"
    val nodes = Seq("node-a", "node-b", "node-c")
    val procs = nodes.map(id => spawnServe(dir, cluster, id, port = 0))
    try {
      // all three APIs must come up (each JVM boots its own SparkSession
      // and binds its own ephemeral port)
      val deadline = System.currentTimeMillis() + 150000
      val ports = nodes.zip(procs).map { case (id, p) =>
        portFromLog(dir, id, p, deadline)
      }
      val clients = ports.map(p => new ApiClient(s"http://127.0.0.1:$p"))
      for ((c, i) <- clients.zipWithIndex) {
        var up = false
        while (!up && System.currentTimeMillis() < deadline) {
          try { c.list(); up = true }
          catch {
            case _: Exception =>
              assert(procs(i).isAlive, s"serve ${nodes(i)} died: " +
                Files.readString(Paths.get(s"$dir/serve-${nodes(i)}.log"))
                  .takeRight(2000))
              Thread.sleep(250)
          }
        }
        assert(up, s"serve ${nodes(i)} never came up")
      }

      Files.writeString(Paths.get(s"$dir/fruit.txt"), "apple\nkiwi\ncherry\n")
      // submit to node-a only — the bus must carry it to b and c
      val jobId = clients.head.submit(
        s"""{"engine_name": "docker", "verifier_name": "ipfs",
           |  "job_spec_docker": {"image": "ubuntu",
           |    "entrypoint": ["cat", "/data/file.txt"]},
           |  "inputs": [{"engine_name": "ipfs", "name": "in",
           |    "cid": "$dir/fruit.txt", "path": "/data/file.txt"}],
           |  "deal": {"concurrency": 2}}""".stripMargin)
      assert(clients.head.waitForJob(jobId, timeoutMs = 120000),
        "job never reached a terminal state across 3 processes")
      // the losing bidder's Cancelled may land just after the replicas
      // complete — wait for all three node states
      val d3 = System.currentTimeMillis() + 15000
      while (clients.head.states(jobId).size < 3 &&
             System.currentTimeMillis() < d3)
        Thread.sleep(200)

      val states = clients.head.states(jobId)
      assert(states.size === 3, s"expected 3 node states, got $states")
      assert(states.map(_._1).toSet === nodes.toSet,
        s"states must come from the 3 distinct processes: $states")
      assert(states.count(_._2 == Lifecycle.State.Complete) === 2,
        s"expected 2 Complete in $states")
      assert(states.count(_._2 == Lifecycle.State.Cancelled) === 1,
        s"expected 1 Cancelled in $states")
      // cross-process replica verification: both executions published the
      // same content digest
      val cids = states.filter(_._2 == Lifecycle.State.Complete).map(_._3)
      assert(cids.forall(_.nonEmpty) && cids.distinct.size === 1,
        s"replica digests disagree: $cids")
      // read path is cluster-wide: node-c (possibly the cancelled one)
      // must answer for the job too
      assert(clients.last.states(jobId).size === states.size)
    } finally procs.foreach(_.destroyForcibly())
  }
}
