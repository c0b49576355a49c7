package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.store.EmbeddedLogStore

/** Diagnostic probe for c17_stream_bloom's CROSS-SESSION bimodality
  * (VERDICT r16 "What's wrong #1": 1.4s builder / 7.3s driver / 2.9s
  * judge on identical code, each a min over >=5 in-session reps — so
  * whatever sets the mode persists for a whole JVM session and the
  * hardened rep protocol cannot see it). This probe runs the c17
  * streaming leg standalone and prints what Bench's single wall number
  * hides, per rep:
  *   - the PHASE split: stream drain vs sink read-back vs final agg
  *   - the micro-batch duration breakdown summed over batches
  *     (triggerExecution / addBatch / walCommit / commitOffsets /
  *     latestOffset / queryPlanning) from StreamingQueryProgress
  *   - state-operator totals (rows, commit time) and JVM GC delta
  * so a slow SESSION attributes to a component: scheduler idle
  * (triggerExecution minus addBatch), checkpoint fsync (walCommit /
  * commitOffsets), state commit, or executor work (addBatch), or
  * none of the above (then the cost is outside the stream — the
  * foreachBatch store writes or the sink read).
  *
  * Usage: runMain graft.ProbeC17 <sfDir> [reps]
  * Run it from SEVERAL fresh JVMs to sample both modes; one JVM's
  * reps share a mode by construction.
  */
object ProbeC17 {
  private val Probes: Seq[Long] =
    (0L to 7L) ++ (0 until 8).map(i => 900000001L + 7L * i)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L
      gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime))
      s
    }

    // one-time source ingest, exactly c17's shape (2 shards)
    val root = java.nio.file.Files.createTempDirectory("graft-probe-c17").toString
    new EmbeddedLogStore(root).createStore("proj", "events", 2)
    val srcOpts = Map("store.root" -> root, "store.project" -> "proj",
      "store.name" -> "events")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.select(
        (col("user_id") % 2).cast(IntegerType).as("__shard__"),
        col("ts").cast("timestamp").cast("long").cast(IntegerType).as("__time__"),
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts").cast("timestamp")).as("ts"),
        col("props"))
      .write.format("graft-logstore").options(srcOpts).mode("append").save()
    val total = ev.count()

    for (rep <- 1 to reps) {
      val dstRoot =
        java.nio.file.Files.createTempDirectory("graft-probe-c17-dst").toString
      new EmbeddedLogStore(dstRoot).createStore("proj", "bloom", 1)
      val dstOpts = Map("store.root" -> dstRoot, "store.project" -> "proj",
        "store.name" -> "bloom")
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-probe-c17-ckpt").toString
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "4")
      s2.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val q = s2.readStream.format("graft-logstore")
        .options(srcOpts)
        .option("maxoffsetspertrigger", math.max(1L, total / 3 + 1).toString)
        .schema("user_id LONG, event_type STRING").load()
        .groupBy(col("event_type"))
        .agg(graft.functions.Bloom.bloom_build(col("user_id"), 4096L, 1e-4)
          .as("bf"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.select(col("event_type"),
              explode(array(Probes.map(p =>
                struct(lit(p).as("probe_uid"),
                  graft.functions.Bloom.bloom_might_contain(col("bf"), lit(p))
                    .as("might"))): _*))
                .as("pr"))
            .select(col("event_type"), col("pr.probe_uid").as("probe_uid"),
              col("pr.might").as("might"))
            .withColumn("batch_id", lit(batchId))
            .write.format("graft-logstore").options(dstOpts)
            .mode("append").save()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val finished = q.awaitTermination(600000)
      if (!finished) {
        System.err.println(s"[probe-c17] TIMEOUT after 600s (rep=$rep)")
        q.stop()
      }
      val tDrain = (System.nanoTime() - t0) / 1e9
      val sink = spark.read.format("graft-logstore").options(dstOpts)
        .schema("event_type STRING, probe_uid LONG, might BOOLEAN, batch_id LONG")
        .load()
      val t1 = System.nanoTime()
      val out = sink.groupBy(col("event_type"), col("probe_uid"))
        .agg(max(struct(col("batch_id"), col("might")))
          .getField("might").as("might"))
      out.write.mode("overwrite").format("noop").save()
      val tSink = (System.nanoTime() - t1) / 1e9
      val gcd = gcMillis() - gc0

      val progs = q.recentProgress
      val keys = Seq("triggerExecution", "addBatch", "walCommit",
        "commitOffsets", "latestOffset", "queryPlanning", "getBatch")
      val sums = keys.map { k =>
        k -> progs.map(p =>
          Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum
      }
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progs.flatMap(_.stateOperators
        .map(_.customMetrics.getOrDefault("stateOnCurrentVersionSizeBytes", 0L)
          .toLong))
      val stCommit = progs.flatMap(_.stateOperators.map(s =>
        Option(s.customMetrics.get("commitTimeMs")).map(_.toLong).getOrElse(0L)))
      println(f"[probe-c17] rep=$rep drain=$tDrain%.2f sinkAgg=$tSink%.2f " +
        f"batches=${progs.length} gcMs=$gcd " +
        sums.map { case (k, v) => s"$k=$v" }.mkString(" ") +
        f" stateRowsMax=${if (stateRows.isEmpty) 0L else stateRows.max} " +
        f"stateCommitMs=${stCommit.sum} stateBytes=${stateBytes.sum}")
    }
    spark.stop()
  }
}
