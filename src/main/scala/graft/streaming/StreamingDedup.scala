package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One per-document verdict: first arrival of a fingerprint passes,
  * later arrivals are flagged. */
case class DedupVerdict(docId: Long, fingerprint: String, isDup: Boolean)

/** Streaming exact dedup on the Spark 4 `transformWithState` API — the
  * successor of mapGroupsWithState (arbitrary stateful processing v2:
  * RocksDB-backed state, typed state variables, per-state TTL). Keyed
  * by content fingerprint; state is ONE long per distinct fingerprint
  * (the admitted doc id), so state size tracks distinct content, not
  * stream length.
  *
  * TTL bounds state for unbounded streams: a duplicate arriving after
  * the window re-admits — the standard dedup-window trade, expressed
  * declaratively instead of via hand-rolled timer bookkeeping. Requires
  * the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), which ships with
  * Spark 4. */
class FingerprintDedupProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[String, (String, Long), DedupVerdict] {

  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val cfg = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
    seen = getHandle.getValueState[Long]("seenDocId", Encoders.scalaLong, cfg)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[DedupVerdict] = {
    rows.map { case (fp, docId) =>
      if (seen.exists()) DedupVerdict(docId, fp, isDup = true)
      else { seen.update(docId); DedupVerdict(docId, fp, isDup = false) }
    }
  }
}

object StreamingDedup {

  /** (fingerprint, doc_id) stream → per-doc dedup verdicts. Pass a
    * `ttl` (with `TimeMode.ProcessingTime`) to bound state on unbounded
    * streams; default keeps state forever (`TimeMode.None`). */
  def exact(docs: Dataset[(String, Long)], ttl: java.time.Duration = null,
      timeMode: TimeMode = TimeMode.None()): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new FingerprintDedupProcessor(ttl),
        timeMode, OutputMode.Append())
  }
}
