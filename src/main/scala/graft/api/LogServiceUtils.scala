package graft.api

import graft.store.EmbeddedLogStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/** Convenience factory API over the `graft-logstore` connector — the
  * Spark-4 replacement for the reference's 22-overload LoghubUtils
  * factory surface (LoghubUtils.scala:36-856): every variant collapses
  * onto reader/writer options, so one method per access pattern suffices
  * (and the connector stays language-agnostic for PySpark, the S10 shim,
  * for free). */
object LogServiceUtils {

  case class StoreRef(root: String, project: String, store: String) {
    def options: Map[String, String] = Map(
      "store.root" -> root, "store.project" -> project, "store.name" -> store)
  }

  /** Create the backing store with `numShards` shards. */
  def createStore(ref: StoreRef, numShards: Int): Unit =
    new EmbeddedLogStore(ref.root).createStore(ref.project, ref.store, numShards)

  /** Bounded batch read; optional schema (default: the 8-column string
    * schema with `__value__` JSON), offsets, or a [startTime, endTime)
    * unix-seconds range (the S8 time-range RDD surface). */
  def createBatchDF(spark: SparkSession, ref: StoreRef,
      schema: Option[StructType] = None,
      startingOffsets: Option[String] = None,
      endingOffsets: Option[String] = None,
      startTime: Option[Int] = None,
      endTime: Option[Int] = None,
      sliceShard: Int = 1): DataFrame = {
    var r = spark.read.format("graft-logstore").options(ref.options)
      .option("store.sliceshard", sliceShard.toString)
    schema.foreach(s => r = r.schema(s))
    startingOffsets.foreach(o => r = r.option("startingoffsets", o))
    endingOffsets.foreach(o => r = r.option("endingoffsets", o))
    startTime.foreach(t => r = r.option("starttime", t.toString))
    endTime.foreach(t => r = r.option("endtime", t.toString))
    r.load()
  }

  /** Micro-batch streaming read (the S1/S5 surface: earliest/latest/
    * specific starts + admission control). */
  def createStreamDF(spark: SparkSession, ref: StoreRef,
      schema: Option[StructType] = None,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 65536L): DataFrame = {
    var r: DataStreamReader = spark.readStream.format("graft-logstore")
      .options(ref.options)
      .option("startingoffsets", startingOffsets)
      .option("maxoffsetspertrigger", maxOffsetsPerTrigger.toString)
    schema.foreach(s => r = r.schema(s))
    r.load()
  }

  /** Batch write (the K2/K6 surface; `__shard__`/`__time__`/`__topic__`/
    * `__source__` columns route, everything else becomes contents). */
  def writeDF(df: DataFrame, ref: StoreRef): Unit =
    df.write.format("graft-logstore").options(ref.options).mode("append").save()

  /** OPTIMIZE: bin-pack small segments into larger ones (streaming
    * sinks accumulate one segment per epoch/task — the small-files
    * problem). Ordinals, offsets, snapshots-at-head, and replay
    * idempotence are preserved; see EmbeddedLogStore.compactSegments.
    * Returns the number of merged segments written. */
  def compactStore(ref: StoreRef, targetRecords: Long = 1L << 20): Int =
    new EmbeddedLogStore(ref.root)
      .compactSegments(ref.project, ref.store, targetRecords)

  /** Retention: expire every shard's prefix of segments wholly older
    * than `beforeTime` (unix seconds). Surviving ordinals are
    * unchanged; `earliest` moves to the per-shard base; cursors below
    * the base read what still exists. Returns segments expired. */
  def expireStore(ref: StoreRef, beforeTime: Int): Int =
    new EmbeddedLogStore(ref.root)
      .expireSegments(ref.project, ref.store, beforeTime)

  /** Consumer-group interop (the reference's user-facing
    * CanCommitOffsets surface, DirectLoghubInputDStream.scala:227-241):
    * publish a group's per-shard progress for external tooling. The
    * store merge is monotonic — stale commits never regress. */
  def commitOffsets(ref: StoreRef, group: String,
      offsets: Map[Int, Long]): Map[Int, Long] =
    new EmbeddedLogStore(ref.root)
      .commitGroupOffsets(ref.project, ref.store, group, offsets)

  def committedOffsets(ref: StoreRef, group: String): Map[Int, Long] =
    new EmbeddedLogStore(ref.root)
      .readGroupOffsets(ref.project, ref.store, group)

  /** The group's committed position as a `startingoffsets` JSON — the
    * restart-from-consumer-group path (reference
    * createConsumerGroupOrGetCheckpoint): None if never committed, else
    * pass the string straight to [[createStreamDF]]'s startingOffsets
    * or a reader's `startingoffsets` option. */
  def resumeOffsetsJson(ref: StoreRef, group: String): Option[String] = {
    val ords = committedOffsets(ref, group)
    if (ords.isEmpty) None
    else Some(graft.connector.LogServiceOffset(
      ref.project, ref.store, ords).json())
  }
}

/** The `commitAsync` analog for Structured Streaming (reference
  * CheckpointManager.java:18-137 batches per-shard cursors and flushes
  * them to the consumer group off the hot path): register on the
  * session and every completed micro-batch's END offsets are committed
  * to the group — asynchronous by construction (listener events fire
  * off the query thread), at-least-once like the reference (a batch can
  * complete and the commit lag behind; the monotonic merge absorbs any
  * replay). Engine checkpointing (O10) still owns exactly-once restart;
  * this surface exists so EXTERNAL consumers see progress.
  *
  * {{{
  * spark.streams.addListener(new OffsetCommitListener(ref, "etl-group"))
  * }}}
  */
class OffsetCommitListener(ref: LogServiceUtils.StoreRef, group: String)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    e.progress.sources.foreach { s =>
      // only this store's sources; other offsets simply don't parse or
      // name a different project#store
      scala.util.Try(graft.connector.LogServiceOffset.parse(s.endOffset))
        .toOption
        .filter(o => o.project == ref.project && o.store == ref.store)
        .foreach(o => LogServiceUtils.commitOffsets(ref, group, o.shardOrdinals))
    }
}
