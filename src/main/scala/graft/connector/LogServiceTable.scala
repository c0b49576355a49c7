package graft.connector

import graft.store.{EmbeddedLogStore, LogRecord, ShardInfo}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DSv2 connector for the embedded log store, short name `graft-logstore`
  * — the Spark-4 re-expression of the reference's five read paths / four
  * write paths (SURVEY.md §2.1/§2.2): one `Table` with batch scan,
  * micro-batch stream, batch write and streaming write.
  *
  * Options (validated like Utils.validateOptions, Utils.scala:40-51):
  *   store.root   — store root directory (shared storage on a cluster)
  *   store.project / store.name
  *   startingoffsets: earliest | latest | {"proj#store":{"0":n}}   (default earliest for batch)
  *   endingoffsets:   latest | {...}                                (batch only)
  *   maxoffsetspertrigger: record budget per micro-batch (default 65536,
  *                         LoghubSource.scala:50-51)
  *   appendsequencenumber: true|false
  */
class LogServiceTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-logstore"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RowConverters.DefaultSchema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LogServiceTable(schema, LogServiceOptions(properties.asScala.toMap))
}

case class LogServiceOptions(all: Map[String, String]) {
  private val norm = all.map { case (k, v) => k.toLowerCase -> v }
  private def required(k: String): String = norm.getOrElse(k.toLowerCase,
    throw new IllegalArgumentException(s"Missing required option '$k'"))
  val root: String = required("store.root")
  val project: String = required("store.project")
  val store: String = required("store.name")
  val startingOffsets: String = norm.getOrElse("startingoffsets", "earliest")
  val endingOffsets: String = norm.getOrElse("endingoffsets", "latest")
  val maxOffsetsPerTrigger: Long =
    norm.getOrElse("maxoffsetspertrigger", "65536").toLong
  val appendSequenceNumber: Boolean =
    norm.getOrElse("appendsequencenumber", "false").toBoolean
  val numShards: Int = norm.getOrElse("store.shards", "2").toInt
  def newStore: EmbeddedLogStore = new EmbeddedLogStore(root)
}

class LogServiceTable(tableSchema: StructType, opts: LogServiceOptions)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"${opts.project}#${opts.store}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
    TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(tableSchema, opts)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LogWriteBuilder(info, opts)
}

/** Column pruning reaches the deserializer: only requested fields are
  * converted (the reference prunes only via user schema,
  * LoghubSourceRDD.scala:178-219 — here Catalyst's pruning flows through
  * SupportsPushDownRequiredColumns, SURVEY.md §2.4 T1). */
class LogScanBuilder(fullSchema: StructType, opts: LogServiceOptions)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var prunedSchema: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve declared field order and metadata handling
    val names = requiredSchema.fieldNames.toSet
    val kept = fullSchema.fields.filter(f => names.contains(f.name))
    prunedSchema = StructType(if (kept.isEmpty) Array(fullSchema.fields.head) else kept)
  }

  override def build(): Scan = new LogScan(prunedSchema, opts)
}

class LogScan(schema: StructType, opts: LogServiceOptions) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-logstore ${opts.project}#${opts.store}"
  override def toBatch: Batch = new LogBatch(schema, opts)
  override def toMicroBatchStream(checkpointLocation: String) =
    new LogMicroBatchStream(schema, opts)
}

/** One InputPartition per shard slice — the unit of parallelism, as in
  * the reference (1 task per shard, LoghubSourceRDD.scala:283-289). */
case class LogInputPartition(project: String, store: String, shard: Int,
    from: Long, until: Long, root: String) extends InputPartition

class LogBatch(schema: StructType, opts: LogServiceOptions) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val store = opts.newStore
    val shards = store.listShards(opts.project, opts.store)
    val startOrds = OffsetRanges.resolve(store, opts, opts.startingOffsets,
      isStart = true, shards)
    val endOrds = OffsetRanges.resolve(store, opts, opts.endingOffsets,
      isStart = false, shards)
    shards.map { s =>
      LogInputPartition(opts.project, opts.store, s.id,
        startOrds.getOrElse(s.id, 0L),
        endOrds.getOrElse(s.id, 0L), opts.root): InputPartition
    }.filter { p => p.asInstanceOf[LogInputPartition].until >
      p.asInstanceOf[LogInputPartition].from }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(schema, opts.appendSequenceNumber)
}

object OffsetRanges {
  /** earliest | latest | offset-json → per-shard ordinals. Validation per
    * reference O2 (LoghubSourceProvider.scala:216-248): a bounded batch
    * cannot start at latest nor end at earliest. */
  def resolve(store: EmbeddedLogStore, opts: LogServiceOptions, spec: String,
      isStart: Boolean, shards: Seq[ShardInfo]): Map[Int, Long] =
    spec.trim.toLowerCase match {
      case "earliest" =>
        if (!isStart) throw new IllegalArgumentException(
          "ending offsets can't be 'earliest'")
        shards.map(_.id -> 0L).toMap
      case "latest" =>
        if (isStart) throw new IllegalArgumentException(
          "starting offsets can't be 'latest' for batch queries")
        shards.map(s => s.id -> store.shardEnd(opts.project, opts.store, s.id)).toMap
      case _ =>
        val o = LogServiceOffset.parse(spec)
        require(o.project == opts.project && o.store == opts.store,
          s"offset json for ${o.project}#${o.store}, expected ${opts.project}#${opts.store}")
        // sentinels per LoghubOffsetRangeLimit: -1 latest, -2 earliest
        o.shardOrdinals.map {
          case (s, -1L) => s -> store.shardEnd(opts.project, opts.store, s)
          case (s, -2L) => s -> 0L
          case (s, n) => s -> n
        }
    }
}

class LogReaderFactory(schema: StructType, appendSeq: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LogInputPartition]
    new LogPartitionReader(schema, lp, appendSeq)
  }
}

class LogPartitionReader(schema: StructType, p: LogInputPartition,
    appendSeq: Boolean) extends PartitionReader[InternalRow] {
  private val store = new EmbeddedLogStore(p.root)
  private val readers = schema.fields.map(f =>
    RowConverters.makeReader(f.dataType, f.nullable))
  private val it: Iterator[(Long, LogRecord)] =
    store.read(p.project, p.store, p.shard, p.from, p.until)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val (ord, rec) = it.next()
    current = RowConverters.recordToRow(schema, readers, p.project, p.store,
      p.shard, ord, rec, appendSeq)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
