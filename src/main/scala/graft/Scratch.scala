package graft

import graft.store.EmbeddedLogStore
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway profiling harness (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    println(s"[scratch] n_events=${ev.count()}")

    for (_ <- 1 to 2) {
      val root = Files.createTempDirectory("graft-scratch").toString
      new EmbeddedLogStore(root).createStore("proj", "events", 4)
      val opts = Map("store.root" -> root, "store.project" -> "proj",
        "store.name" -> "events")
      time("c1 ingest") {
        ev.select(
            (col("user_id") % 4).cast(IntegerType).as("__shard__"),
            expr("ts DIV 1000000000").cast(IntegerType).as("__time__"),
            col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts"), col("props"))
          .write.format("graft-logstore").options(opts).mode("append").save()
      }
      time("c1 typed read+agg") {
        spark.read.format("graft-logstore").options(opts)
          .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts LONG")
          .load()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .write.mode("overwrite").format("noop").save()
      }
      time("c2 default read") {
        spark.read.format("graft-logstore").options(opts).load()
          .select(get_json_object(col("__value__"), "$.event_type").as("event_type"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
