package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the devstack FileBus event log
  * (`jobs/Devstack.FileBus`): `spark.read.format("graft-jobevents")
  * .load(clusterDir)` reads the control-plane's append-only bus as a
  * proper table — the A15 event feed exposed to the FULL relational
  * surface instead of the driver-local `EventLog.toDF` path.
  *
  * Why a real DSv2 instead of `spark.read.json(dir)`:
  *
  *  - **File-level time pruning.** The bus names every file
  *    `%020d-<node>-<seq>.json` with the event's Lamport µs stamp, and
  *    each file holds exactly ONE event — so any `event_time_us`
  *    range/equality predicate is decided from the FILENAME, before a
  *    single byte is opened. `pushFilters` accepts those predicates
  *    fully (no residual re-evaluation; the pruning is exact), the same
  *    shape as parquet partition pruning. On a long-lived cluster dir
  *    with millions of events, "what happened in the last minute" reads
  *    only the last minute's files.
  *  - **Column pruning.** `pruneColumns` reaches the JSON parse: a
  *    `select(job_id)` materializes one field per event, not eight.
  *    The pruned schema and accepted time range are printed in the scan's
  *    `description()` — visible in `.explain`, pinned by the spec.
  *  - **Parallel scan.** The (pruned) file list splits into up to
  *    `maxPartitions` slices; each task parses its slice independently.
  *    Bus ORDER is the filename sort — callers needing it sort by
  *    `event_time_us` (globally unique by Lamport construction), exactly
  *    like any distributed source.
  *
  * Reference analog: the controller tails libp2p pubsub and folds
  * events into state (pkg/controller/controller.go:351-385); here the
  * same feed is a first-class Spark table, so the fold IS a query
  * (`EventLog.foldStates`) and every other operator composes with it.
  */
object JobEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("client_id", StringType),
    StructField("source_node_id", StringType),
    StructField("target_node_id", StringType),
    StructField("event_name", StringType),
    StructField("status", StringType),
    StructField("results_id", StringType),
    StructField("event_time_us", LongType)))

  /** `load(p)` accepts the cluster dir (events live in `p/events`) or
    * the events dir itself. */
  def eventsDir(path: String): Path = {
    val p = Paths.get(path)
    val sub = p.resolve("events")
    if (Files.isDirectory(sub)) sub else p
  }

  /** Lamport µs stamp from the bus filename (`%020d-node-seq.json`). */
  def stampOf(name: String): Option[Long] =
    if (name.length > 20 && name.charAt(20) == '-')
      name.substring(0, 20).toLongOption
    else None
}

final class JobEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jobevents"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JobEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-jobevents requires a path: spark.read.format(...).load(dir)"))
    new JobEventsTable(path)
  }
}

final class JobEventsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-jobevents($path)"
  override def schema(): StructType = JobEventsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new JobEventsScanBuilder(path)
}

/** Streaming offset = the highest Lamport µs stamp consumed so far. The
  * bus guarantees stamps are strictly increasing per append (Devstack
  * `nextUs`), so "(lastStamp, latest]" is an exactly-once batch bound
  * with no file ever re-read or skipped. */
final case class JobEventsOffset(stampUs: Long) extends Offset {
  override def json(): String = stampUs.toString
}

/** Micro-batch face of the same scan: each trigger reads the files whose
  * filename stamp lies in (start, end] — `readStream.format(
  * "graft-jobevents")` tails the control-plane bus the way the reference
  * controller tails libp2p pubsub, restart-safe via the checkpointed
  * stamp offset. */
final class JobEventsMicroBatchStream(path: String, required: StructType)
  extends MicroBatchStream {

  private def latestStamp(): Long = {
    val dir = JobEventsSource.eventsDir(path)
    if (!Files.isDirectory(dir)) return 0L
    scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("."))
        .flatMap(JobEventsSource.stampOf)
        .foldLeft(0L)(math.max)
    }
  }

  override def latestOffset(): Offset = JobEventsOffset(latestStamp())
  override def initialOffset(): Offset = JobEventsOffset(0L)
  override def deserializeOffset(json: String): Offset =
    JobEventsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[JobEventsOffset].stampUs
    val hi = end.asInstanceOf[JobEventsOffset].stampUs
    val dir = JobEventsSource.eventsDir(path)
    if (!Files.isDirectory(dir) || hi <= lo) return Array.empty
    val names = scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("."))
        .filter(n => JobEventsSource.stampOf(n)
          .exists(us => us > lo && us <= hi))
        .toVector
    }.sorted
    if (names.isEmpty) Array.empty
    else Array(JobEventsPartition(
      names.map(n => dir.resolve(n).toString).toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JobEventsReaderFactory(required)
}

/** Accepts `event_time_us` comparisons (fully — filename pruning is
  * exact, one event per file) and prunes the parse schema. Everything
  * else stays a residual for Spark to evaluate. */
final class JobEventsScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = JobEventsSource.schema
  private var loUs: Long = Long.MinValue
  private var hiUs: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val ts = "event_time_us"
    val (acc, rest) = filters.partition {
      case EqualTo(`ts`, _: java.lang.Long | _: Long) => true
      case GreaterThan(`ts`, _: java.lang.Long | _: Long) => true
      case GreaterThanOrEqual(`ts`, _: java.lang.Long | _: Long) => true
      case LessThan(`ts`, _: java.lang.Long | _: Long) => true
      case LessThanOrEqual(`ts`, _: java.lang.Long | _: Long) => true
      // every field of a bus event is written non-null, so IsNotNull is
      // vacuously true — accepting it removes the residual Filter Spark
      // otherwise adds next to any pushed comparison
      case IsNotNull(_) => true
      case _ => false
    }
    acc.foreach {
      case EqualTo(_, v) =>
        val x = v.asInstanceOf[Long]
        loUs = math.max(loUs, x); hiUs = math.min(hiUs, x)
      case GreaterThan(_, v) =>
        loUs = math.max(loUs, v.asInstanceOf[Long] + 1)
      case GreaterThanOrEqual(_, v) =>
        loUs = math.max(loUs, v.asInstanceOf[Long])
      case LessThan(_, v) =>
        hiUs = math.min(hiUs, v.asInstanceOf[Long] - 1)
      case LessThanOrEqual(_, v) =>
        hiUs = math.min(hiUs, v.asInstanceOf[Long])
      case _ => ()
    }
    pushed = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new JobEventsScan(path, required, loUs, hiUs)
}

final case class JobEventsPartition(files: Array[String])
  extends InputPartition

final class JobEventsScan(path: String, required: StructType,
    loUs: Long, hiUs: Long, maxPartitions: Int = 16)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new JobEventsMicroBatchStream(path, required)
  override def description(): String =
    s"JobEventsScan(path=$path, pushedTimeRange=[$loUs,$hiUs], " +
      s"columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = JobEventsSource.eventsDir(path)
    if (!Files.isDirectory(dir)) return Array.empty
    val names = scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("."))
        .filter(n => JobEventsSource.stampOf(n)
          .exists(us => us >= loUs && us <= hiUs))
        .toVector
    }.sorted
    if (names.isEmpty) return Array.empty
    val slices = math.min(maxPartitions, names.size)
    names.grouped((names.size + slices - 1) / slices)
      .map(g => JobEventsPartition(
        g.map(n => dir.resolve(n).toString).toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JobEventsReaderFactory(required)
}

final class JobEventsReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new JobEventsReader(
      partition.asInstanceOf[JobEventsPartition].files, required)
}

/** One event per file; emits only the pruned columns. */
final class JobEventsReader(files: Array[String], required: StructType)
  extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fields = required.fieldNames
  private var i = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (i >= files.length) return false
    val n = mapper.readTree(Files.readString(Paths.get(files(i))))
    i += 1
    row = InternalRow.fromSeq(fields.toIndexedSeq.map {
      case "event_time_us" => n.get("event_time_us").asLong()
      case f => UTF8String.fromString(n.get(f).asText())
    })
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
