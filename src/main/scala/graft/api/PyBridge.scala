package graft.api

import scala.jdk.CollectionConverters._

/** Java-typed entry points for the PySpark module (python/graft_logstore
  * .py) — the reference ships a py4j shim because its DStream surface is
  * JVM-only (loghub.py:26-196); on DSv2 the DATA path needs no shim, so
  * only the admin surface (store creation, dynamic config, consumer
  * groups) crosses the gateway, and py4j marshals `java.util` types, not
  * Scala collections. Every method delegates to [[LogServiceUtils]] /
  * the store; no logic lives here. */
object PyBridge {

  private def ref(root: String, project: String, store: String) =
    LogServiceUtils.StoreRef(root, project, store)

  def createStore(root: String, project: String, store: String,
      numShards: Int): Unit =
    LogServiceUtils.createStore(ref(root, project, store), numShards)

  def updateSourceConfig(root: String, project: String, store: String,
      config: java.util.Map[String, String]): Unit = {
    val s = new graft.store.EmbeddedLogStore(root)
    val merged = s.readSourceConfig(project, store) ++ config.asScala
    s.writeSourceConfig(project, store, merged)
  }

  def readSourceConfig(root: String, project: String,
      store: String): java.util.Map[String, String] =
    new graft.store.EmbeddedLogStore(root)
      .readSourceConfig(project, store).asJava

  def commitOffsets(root: String, project: String, store: String,
      group: String,
      // Number, not Long: py4j boxes a Python int that fits 32 bits as
      // java.lang.Integer no matter what the caller constructs
      offsets: java.util.Map[Integer, java.lang.Number]): Unit =
    LogServiceUtils.commitOffsets(ref(root, project, store), group,
      offsets.asScala.map { case (k, v) => (k: Int) -> v.longValue() }.toMap)

  def committedOffsets(root: String, project: String, store: String,
      group: String): java.util.Map[Integer, java.lang.Long] =
    LogServiceUtils.committedOffsets(ref(root, project, store), group)
      .map { case (k, v) => (Int.box(k): Integer) -> (Long.box(v): java.lang.Long) }
      .asJava

  /** `startingoffsets` JSON for the group, or null if never committed —
    * py4j maps null onto Python None. */
  def resumeOffsetsJson(root: String, project: String, store: String,
      group: String): String =
    LogServiceUtils.resumeOffsetsJson(ref(root, project, store), group)
      .orNull

  def compactStore(root: String, project: String, store: String,
      targetRecords: Long): Int =
    LogServiceUtils.compactStore(ref(root, project, store), targetRecords)

  def expireStore(root: String, project: String, store: String,
      beforeTime: Int): Int =
    LogServiceUtils.expireStore(ref(root, project, store), beforeTime)
}
