package graft.jobs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.jdk.CollectionConverters._

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

  test("split-brain election: two holders decide on DIVERGENT bus views; " +
       "the heal converges with fold-idempotent duplicate decisions") {
    // VERDICT r8 #5, the adversarial form of the documented one-poll
    // overlap: the lease design claims that concurrent holders are benign
    // because the decision function is deterministic in the bus prefix.
    // The live specs can only produce overlap by lucky scheduling; here
    // the overlap is FORCED by a real partition. The event bus is files,
    // so a partition is two cluster directories and healing is a file-
    // level union (names are globally unique Lamport keys — exactly the
    // reference transport's at-least-once, unordered delivery,
    // pkg/transport/libp2p/libp2p.go:219-289). node-c lives on the B
    // side; everyone else on A. The creator goes silent after Created,
    // both sides independently observe lease expiry, elect THEMSELVES,
    // and decide the same bid prefix — then the partition heals and the
    // fold must converge with the deal neither over- nor under-filled.
    val dir = Files.createTempDirectory("graft-sb").toString
    Files.writeString(Paths.get(s"$dir/fruit.txt"), "apple\nkiwi\n")
    val dirA = s"$dir/clusterA"
    val dirB = s"$dir/clusterB"
    // requester lease bound (ms). 1500 not 500: on a contended box a
    // post-heal step round can take >500 ms, at which point node-d
    // LEGITIMATELY claims the re-expired lease and the final
    // single-holder assertion sees a third elect — correct protocol
    // behavior, wrong test premise. The wider bound keeps the forced
    // split (sleep R+300) the only expiry the test produces.
    val R = 1500L
    val a = new DevstackNode(spark, "node-a", dirA,
      requesterStaleMs = R, computeDisabled = true)
    val b = new DevstackNode(spark, "node-b", dirA, requesterStaleMs = R)
    val d = new DevstackNode(spark, "node-d", dirA, requesterStaleMs = R)
    val c = new DevstackNode(spark, "node-c", dirB, requesterStaleMs = R)

    // heal/sync primitive: union-copy the immutable event/job files
    def syncDirs(): Unit =
      for {
        sub <- Seq("events", "jobs")
        (from, to) <- Seq((dirA, dirB), (dirB, dirA))
      } {
        val src = Paths.get(from, sub)
        val dst = Paths.get(to, sub)
        Files.createDirectories(dst)
        if (Files.isDirectory(src))
          scala.util.Using.resource(Files.list(src)) { st =>
            st.iterator().asScala
              .filterNot(_.getFileName.toString.startsWith("."))
              .foreach { p =>
                val t = dst.resolve(p.getFileName)
                if (!Files.exists(t)) Files.copy(p, t)
              }
          }
      }

    val t0 = System.currentTimeMillis()
    val job = a.submitRaw(specJson(dir), "client-1").toOption.get
    syncDirs()
    b.step(); d.step(); c.step() // bids: b,d on side A; c on side B
    syncDirs() // pre-partition: everyone agrees on Created + all 3 bids
    assert(System.currentTimeMillis() - t0 < R,
      "setup overran the lease bound; raise R for a meaningful split")
    val busA = new FileBus(Paths.get(dirA))
    val busB = new FileBus(Paths.get(dirB))
    assert(!busA.events().exists(
      _.eventName == Lifecycle.EventType.RequesterElect),
      "no election may exist before the partitioned expiry")

    // creator goes silent; BOTH sides age past the lease bound with the
    // partition up — neither side can see the other's claim
    Thread.sleep(R + 300)
    b.step() // claims the lease on side A
    c.step() // claims the lease on side B
    b.step() // holder on A: accepts 2, cancels 1
    c.step() // holder on B: same decisions, different source
    val preA = busA.events().filter(_.jobId == job.id)
    val preB = busB.events().filter(_.jobId == job.id)
    def elects(evs: Seq[JobEvent]) =
      evs.filter(_.eventName == Lifecycle.EventType.RequesterElect)
    assert(elects(preA).map(_.sourceNodeId).distinct === Seq("node-b"),
      s"side A must have elected node-b only: ${elects(preA)}")
    assert(elects(preB).map(_.sourceNodeId).distinct === Seq("node-c"),
      s"side B must have elected node-c only: ${elects(preB)}")
    // the heart of the benign-overlap claim: both holders, blind to each
    // other, appended IDENTICAL decision sets (deterministic in the
    // shared pre-partition prefix)
    def decisions(evs: Seq[JobEvent], src: String) =
      evs.filter(e => e.sourceNodeId == src &&
          (e.eventName == Lifecycle.EventType.BidAccepted ||
           e.eventName == Lifecycle.EventType.BidCancelled))
        .map(e => (e.eventName, e.targetNodeId)).toSet
    val decA = decisions(preA, "node-b")
    val decB = decisions(preB, "node-c")
    assert(decA.nonEmpty && decA === decB,
      s"split holders must make identical decisions: A=$decA B=$decB")
    assert(decA.count(_._1 == Lifecycle.EventType.BidAccepted) === 2)

    // HEAL: union the views, then drive everyone to convergence
    val tHeal = System.currentTimeMillis()
    syncDirs()
    (1 to 4).foreach { _ =>
      b.step(); c.step(); d.step(); syncDirs()
    }
    // If the post-heal rounds themselves overran the lease bound, any
    // idle node may LEGITIMATELY claim the re-expired lease (the same
    // correct-protocol/wrong-premise case the R=1500 comment above
    // documents — observed when the suite shares the box with another
    // 32-way job). The singular-holder assertion below only holds under
    // the fresh-lease premise; record whether it held.
    val leaseStayedFresh = System.currentTimeMillis() - tHeal < R
    val evs = busA.events().filter(_.jobId == job.id)
    val fin = EventLog.foldLocal(evs)
    val states = Seq("node-b", "node-c", "node-d")
      .map(n => fin((job.id, n)).state)
    assert(states.count(_ == Lifecycle.State.Complete) === 2 &&
      states.count(_ == Lifecycle.State.Cancelled) === 1,
      s"post-heal fold must be 2 Complete + 1 Cancelled: $states")
    // the duplicates are REAL (each accepted bidder was accepted once per
    // holder) and the fold absorbed them: distinct targets, not event
    // counts, fill the deal
    val accepts = evs.filter(_.eventName == Lifecycle.EventType.BidAccepted)
    assert(accepts.size === 4,
      s"expected 2 bidders x 2 blind holders = 4 accept events: $accepts")
    assert(accepts.map(_.targetNodeId).distinct.size === 2,
      "the deal must not over-fill from duplicate decisions")
    assert(accepts.map(_.sourceNodeId).distinct.toSet ===
      Set("node-b", "node-c"),
      "both split holders must have decided")
    // each accepted replica executed exactly ONCE (no duplicate runs from
    // the duplicate acceptances)
    val runs = evs.filter(_.eventName == Lifecycle.EventType.Running)
      .map(_.sourceNodeId)
    assert(runs.size === runs.distinct.size,
      s"a replica must not execute twice off duplicate accepts: $runs")
    // digest agreement across executions decided by DIFFERENT holders
    val cids = Seq("node-b", "node-c", "node-d")
      .map(n => fin((job.id, n)))
      .filter(_.state == Lifecycle.State.Complete).map(_.resultsId)
    assert(cids.forall(_.nonEmpty) && cids.distinct.size === 1,
      s"replica digests must agree across the healed partition: $cids")
    // post-heal the lease is singular again: the merged bus has one LAST
    // claim, and only that node may decide afterwards. Under the
    // fresh-lease premise that claim is one of the split holders; if the
    // box was slow enough that the lease re-expired mid-heal, a third
    // elect by node-d is correct protocol behavior, not a failure.
    val lastHolder = elects(evs).last.sourceNodeId
    if (leaseStayedFresh) assert(Set("node-b", "node-c")(lastHolder))
    else assert(Set("node-b", "node-c", "node-d")(lastHolder),
      s"post-heal holder must still be a cluster node: $lastHolder")
  }
}
