package graft.jobs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Devstack protocol semantics driven DETERMINISTICALLY: three in-JVM
  * nodes share a file bus and this test calls step() by hand, so every
  * interleaving — bid order, acceptance, surplus cancellation, the
  * stale-replica failover — is exact, with no process spawning or poll
  * timing. (ThreeProcessSpec covers the same protocol across real JVMs;
  * this spec covers the branches a live run can't schedule reliably,
  * namely a replica dying between acceptance and completion.)
  */
class DevstackSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def specJson(dir: String) =
    s"""{"engine_name": "docker", "verifier_name": "ipfs",
       |  "job_spec_docker": {"image": "ubuntu",
       |    "entrypoint": ["cat", "/data/file.txt"]},
       |  "inputs": [{"engine_name": "ipfs", "name": "in",
       |    "cid": "$dir/fruit.txt", "path": "/data/file.txt"}],
       |  "deal": {"concurrency": 2}}""".stripMargin

  test("stale accepted replica draws Error and a cancelled bidder is re-accepted") {
    val dir = Files.createTempDirectory("graft-ds").toString
    Files.writeString(Paths.get(s"$dir/fruit.txt"), "apple\nkiwi\n")
    val cluster = s"$dir/cluster"
    // requester watches for staleness at 50 ms; b and c never time out
    // anything because only the job's creator runs the liveness check
    val a = new DevstackNode(spark, "node-a", cluster, staleMs = 50)
    val b = new DevstackNode(spark, "node-b", cluster)
    val c = new DevstackNode(spark, "node-c", cluster)

    val job = a.submitRaw(specJson(dir), "client-1").toOption.get
    a.step() // a bids
    b.step() // b bids
    c.step() // c bids
    a.step() // requester: accept a + b, cancel c (decisions read pre-step
             // state, so a's own execution waits for the next step)
    a.step() // a sees its acceptance and executes its replica
    val afterAccept = EventLog.foldLocal(a.bus.events())
    assert(afterAccept((job.id, "node-a")).state === Lifecycle.State.Complete)
    assert(afterAccept((job.id, "node-b")).state === Lifecycle.State.Waiting)
    assert(afterAccept((job.id, "node-c")).state === Lifecycle.State.Cancelled)

    // node-b "crashes": it never steps again. Age past the bound.
    Thread.sleep(120)
    a.step() // liveness: Error for b, re-accept c as the replacement
    val afterFail = EventLog.foldLocal(a.bus.events())
    assert(afterFail((job.id, "node-b")).state === Lifecycle.State.Error)
    assert(afterFail((job.id, "node-b")).status.contains("presumed dead"))
    assert(afterFail((job.id, "node-c")).state === Lifecycle.State.Waiting)

    c.step() // the replacement executes
    val fin = EventLog.foldLocal(a.bus.events())
    assert(fin((job.id, "node-a")).state === Lifecycle.State.Complete)
    assert(fin((job.id, "node-c")).state === Lifecycle.State.Complete)
    // cross-replica verification still holds across the failover: the
    // replacement's digest matches the surviving original's
    val cids = Seq(fin((job.id, "node-a")).resultsId,
      fin((job.id, "node-c")).resultsId)
    assert(cids.forall(_.nonEmpty) && cids.distinct.size === 1, cids)
  }

  test("no false positives: completed and cancelled nodes are never staled") {
    val dir = Files.createTempDirectory("graft-ds2").toString
    Files.writeString(Paths.get(s"$dir/fruit.txt"), "pear\n")
    val cluster = s"$dir/cluster"
    val a = new DevstackNode(spark, "node-a", cluster, staleMs = 10)
    val b = new DevstackNode(spark, "node-b", cluster)
    val job = a.submitRaw(specJson(dir), "client-1").toOption.get
    a.step(); b.step()
    a.step() // accept a + b; a executes
    b.step() // b executes
    Thread.sleep(60) // well past staleMs
    a.step() // liveness pass over two COMPLETED replicas: no-op
    val fin = EventLog.foldLocal(a.bus.events())
    assert(fin((job.id, "node-a")).state === Lifecycle.State.Complete)
    assert(fin((job.id, "node-b")).state === Lifecycle.State.Complete)
    assert(!a.bus.events().exists(_.eventName == Lifecycle.EventType.Error))
  }
}
