package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Event-sourced job state (reference: the controller's event fold —
  * pkg/controller/controller.go:351-385 + pkg/localdb/inmemory).
  *
  * Append-only log; state is *derived*, never stored: the fold keyed by
  * (jobId, nodeId) applies `Lifecycle.stateFromEvent` with the reference's
  * partial-update rule (empty status/resultsId never overwrite a previous
  * non-empty value — controller.go:362-377).
  *
  * Two faces: a driver-local synchronous fold (the control plane is small),
  * and a Dataset view (`toDF`/`foldStates`) so the same semantics run
  * distributed over an events table of any size — the Dataset fold is a
  * window max-by, i.e. one shuffle on (jobId, nodeId).
  */
final class EventLog {
  private val events = mutable.ArrayBuffer.empty[JobEvent]
  private var seq = 0L

  def append(e: JobEvent): JobEvent = synchronized {
    seq += 1
    val stamped = if (e.eventTimeUs == 0) e.copy(eventTimeUs = seq) else e
    events += stamped
    stamped
  }

  def all: Seq[JobEvent] = synchronized(events.toVector)

  def forJob(jobId: String): Seq[JobEvent] =
    all.filter(_.jobId == jobId)

  /** Driver-local fold — reference `GetStateFromEvent` + partial update. */
  def states: Map[(String, String), JobNodeState] =
    EventLog.foldLocal(all)

  /** Summarize a job to its "furthest along" non-bid-rejected state
    * (reference: pkg/job/job.go:233-263). */
  def currentJobState(jobId: String): Option[JobNodeState] =
    states.values
      .filter(s => s.jobId == jobId && s.state != Lifecycle.State.BidRejected)
      .toSeq
      .sortBy(s => (-Lifecycle.progressRank(s.state), s.nodeId))
      .headOption

  /** A24 across ALL jobs from a single fold — callers listing many jobs
    * must use this instead of currentJobState per row (which refolds the
    * whole log each call: O(jobs × events)). */
  def currentStates: Map[String, JobNodeState] =
    EventLog.summarize(states.values)

  def toDF(spark: SparkSession): Dataset[JobEvent] = {
    import spark.implicits._
    spark.createDataset(all)
  }
}

object EventLog {
  /** The in-memory fold over any event sequence (shared by the in-process
    * log and the devstack file bus): latest state-bearing event per
    * (jobId, nodeId) wins, empty status/resultsId never overwrite. */
  def foldLocal(events: Seq[JobEvent]): Map[(String, String), JobNodeState] = {
    val m = mutable.LinkedHashMap.empty[(String, String), JobNodeState]
    events.foreach { e =>
      Lifecycle.stateFromEvent(e.eventName).foreach { st =>
        val key = (e.jobId, e.targetNodeId)
        val prev = m.getOrElse(key, JobNodeState(e.jobId, e.targetNodeId, st))
        m(key) = JobNodeState(
          jobId = e.jobId,
          nodeId = e.targetNodeId,
          state = st,
          status = if (e.status.nonEmpty) e.status else prev.status,
          resultsId = if (e.resultsId.nonEmpty) e.resultsId else prev.resultsId)
      }
    }
    m.toMap
  }

  /** A24 "furthest along" pick per job over already-folded node states
    * (shared by currentStates and list-style callers that hold the fold). */
  def summarize(states: Iterable[JobNodeState]): Map[String, JobNodeState] =
    states.toSeq
      .filter(_.state != Lifecycle.State.BidRejected)
      .groupBy(_.jobId)
      .map { case (id, ss) =>
        id -> ss.sortBy(s => (-Lifecycle.progressRank(s.state), s.nodeId)).head
      }

  /** Distributed twin of the in-memory fold: latest state-bearing event per
    * (jobId, nodeId) wins; status/resultsId backfilled from the last
    * non-empty value (reference partial-update rule). */
  def foldStates(events: DataFrame): DataFrame = {
    val stateExpr = {
      import Lifecycle._
      when(col("eventName") === EventType.Bid, State.Bidding)
        .when(col("eventName") === EventType.BidAccepted, State.Waiting)
        .when(col("eventName") === EventType.BidRejected, State.BidRejected)
        .when(col("eventName") === EventType.BidCancelled, State.Cancelled)
        .when(col("eventName") === EventType.Running, State.Running)
        .when(col("eventName") === EventType.Completed, State.Complete)
        .when(col("eventName") === EventType.Error, State.Error)
    }
    val w = Window.partitionBy("jobId", "targetNodeId")
      .orderBy(col("eventTimeUs").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("jobId", "targetNodeId")
      .orderBy(col("eventTimeUs").desc)
    events
      .withColumn("state", stateExpr)
      .filter(col("state").isNotNull)
      .withColumn("status_f",
        last(when(col("status") =!= "", col("status")), ignoreNulls = true).over(w))
      .withColumn("results_f",
        last(when(col("resultsId") =!= "", col("resultsId")), ignoreNulls = true).over(w))
      .withColumn("rn", row_number().over(wAll))
      .filter(col("rn") === 1)
      .select(col("jobId"), col("targetNodeId").as("nodeId"), col("state"),
        coalesce(col("status_f"), lit("")).as("status"),
        coalesce(col("results_f"), lit("")).as("resultsId"))
  }
}
