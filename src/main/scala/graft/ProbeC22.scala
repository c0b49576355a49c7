package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.store.EmbeddedLogStore

/** Diagnostic probe for c22's stress curve (SCALE.md): runs the
  * timer-sessionization stream standalone at a given events dir and
  * state-partition count, and reports what the catalog closure hides —
  * micro-batch count, state-store row totals from StreamingQuery
  * progress, and wall time. Purpose: attribute the super-linear
  * 30x→100x step to the single-box state backend (one RocksDB instance
  * per partition on one disk) vs the plan, by showing (a) state row
  * population is linear in copies and (b) spreading the same state
  * over more store instances on ONE box does not recover the step —
  * whereas a cluster hosts the instances on separate machines.
  *
  * Round 18 (verdict item 3: the remaining 3.57 step30to100 vs 3.33
  * linear): the per-rep line now splits the wall into components —
  * micro-batch duration keys (triggerExecution / addBatch / walCommit /
  * commitOffsets / latestOffset / queryPlanning), state-operator times
  * (allUpdatesTimeMs / allRemovalsTimeMs / commitTimeMs), JVM GC delta,
  * shuffle read/write/spill bytes from a task-metrics listener, and the
  * top RocksDB custom-metric sums — so the step attributes to a named
  * component rather than a guess.
  *
  * Usage: runMain graft.ProbeC22 <eventsDir> <stateParts> [reps]
  */
object ProbeC22 {
  /** Task-metrics accumulator shared across all jobs in the JVM;
    * snapshot-and-diff per rep. */
  private class TaskAgg extends org.apache.spark.scheduler.SparkListener {
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        cpuNs.addAndGet(m.executorCpuTime)
        runMs.addAndGet(m.executorRunTime)
      }
    }
    def snap(): Map[String, Long] = Map(
      "shufWriteB" -> shufWrite.get, "shufReadB" -> shufRead.get,
      "spillMemB" -> spillMem.get, "spillDiskB" -> spillDisk.get,
      "cpuMs" -> cpuNs.get / 1000000L, "runMs" -> runMs.get)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val parts = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val gapS = 1800L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new TaskAgg
    spark.sparkContext.addSparkListener(agg)
    // The listener bus delivers task-end events asynchronously — a
    // snapshot taken right after q.stop() can miss in-flight events and
    // bleed their bytes/cpu into the NEXT rep's delta. waitUntilEmpty is
    // private[spark], so drain by polling until the accumulator
    // stabilizes (bounded at 2s).
    def drainedSnap(): Map[String, Long] = {
      var prev = agg.snap()
      var tries = 0
      while (tries < 20) {
        Thread.sleep(100)
        val cur = agg.snap()
        if (cur == prev) return cur
        prev = cur; tries += 1
      }
      prev
    }
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L
      gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime))
      s
    }

    // one-time source ingest (the c9Source shape: events + far-future
    // flush sentinel on two shards, __time__ = epoch seconds)
    val root = java.nio.file.Files.createTempDirectory("graft-probe-c22").toString
    new EmbeddedLogStore(root).createStore("proj", "sess", 2)
    val srcOpts = Map("store.root" -> root, "store.project" -> "proj",
      "store.name" -> "sess")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts").cast("timestamp").cast("long").as("t"))
    val maxT = ev.agg(max(col("t"))).first().getLong(0)
    val sentinel = spark.range(1).select(lit(-1L).as("user_id"),
      lit("__flush__").as("event_type"), lit(0.0).as("value"),
      lit(maxT + gapS + 3600L).as("t"))
    ev.unionAll(sentinel)
      .select(pmod(col("user_id"), lit(2)).cast(IntegerType).as("__shard__"),
        col("t").cast(IntegerType).as("__time__"),
        col("user_id"), col("event_type"), col("value"))
      .write.format("graft-logstore").options(srcOpts).mode("append").save()

    for (rep <- 1 to reps) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
      // recentProgress is capped (default 100 updates) — a long run
      // would silently under-report batch counts and summed metrics.
      // Raise the retention well past any probe's batch count.
      s2.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import s2.implicits._
      val src = s2.readStream.format("graft-logstore").options(srcOpts)
        .option("maxoffsetspertrigger", "1000000")
        .schema("user_id LONG, event_type STRING, value DOUBLE, __time__ TIMESTAMP")
        .load()
        .withWatermark("__time__", "1 second")
        .selectExpr("user_id", "CAST(__time__ AS LONG) AS t")
        .as[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-probe-ckpt").toString
      val task0 = agg.snap()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val q = graft.streaming.SessionTimers.sessions(src, gapS)
        .toDF("user_id", "session_start", "session_end", "n_events")
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val finished = q.awaitTermination(600000)
      if (!finished) {
        // a timed-out run's wall time is the timeout, not the query —
        // say so loudly rather than print a misleading number
        System.err.println(s"[probe-c22] TIMEOUT after 600s (rep=$rep); " +
          "metrics below cover a PARTIAL run")
        q.stop()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val gcd = gcMillis() - gc0
      val task1 = drainedSnap()
      val taskD = task1.map { case (k, v) => k -> (v - task0(k)) }
      val progs = q.recentProgress
      val batches = progs.length
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val maxState = if (stateRows.isEmpty) 0L else stateRows.max
      val updated = progs.flatMap(_.stateOperators.map(_.numRowsUpdated)).sum
      val removed = progs.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      def stSum(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long)
          : Long = progs.flatMap(_.stateOperators.map(f)).sum
      val durKeys = Seq("triggerExecution", "addBatch", "walCommit",
        "commitOffsets", "latestOffset", "queryPlanning", "getBatch")
      val durs = durKeys.map { k =>
        k -> progs.map(p =>
          Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum
      }
      // top RocksDB / state-store custom-metric totals, generic against
      // metric-name drift: sum everything, print the 8 largest
      val custom = scala.collection.mutable.Map.empty[String, Long]
      progs.foreach(_.stateOperators.foreach(_.customMetrics.forEach {
        (k, v) => custom(k) = custom.getOrElse(k, 0L) + v.longValue()
      }))
      val topCustom = custom.toSeq.sortBy(-_._2).take(8)
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(f"[probe-c22] dir=$dir parts=$parts rep=$rep " +
        f"wall=$wall%.2f batches=$batches maxStateRows=$maxState " +
        f"rowsUpdated=$updated rowsRemoved=$removed " +
        f"updMs=${stSum(_.allUpdatesTimeMs)} " +
        f"rmMs=${stSum(_.allRemovalsTimeMs)} " +
        f"commitMs=${stSum(_.commitTimeMs)} gcMs=$gcd " +
        durs.map { case (k, v) => s"$k=$v" }.mkString(" ") + " " +
        taskD.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString(" ") +
        (if (finished) "" else " PARTIAL(timeout)"))
      println(s"[probe-c22] rep=$rep topCustom: $topCustom")
    }
    spark.stop()
  }
}
