package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()

    for (_ <- 1 to 2) {
      val sh = time("docShingles") { val s = Dedup.docShingles(docs); s.cache().count(); s }

      // variant A: current string-key join
      time("d2 A string join") {
        val a = sh.as("a"); val b = sh.as("b")
        a.join(b, col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("inter"))
          .write.mode("overwrite").format("noop").save()
      }

      // variant B: hash-encoded key join
      time("d2 B hash-key join") {
        val enc = sh.select(col("doc_id"), xxhash64(col("shingle")).as("s"))
        val a = enc.as("a"); val b = enc.as("b")
        a.join(b, col("a.s") === col("b.s") &&
            col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("inter"))
          .write.mode("overwrite").format("noop").save()
      }

      // variant C: groupBy shingle-hash, in-group pair emission, count pairs
      time("d2 C grouped pairs") {
        sh.select(col("doc_id"), xxhash64(col("shingle")).as("s"))
          .groupBy(col("s"))
          .agg(collect_list(col("doc_id")).as("ids"))
          .select(col("ids"))
          .filter(size(col("ids")) > 1)
          .as[Seq[Long]]
          .flatMap { ids =>
            val arr = ids.toArray
            java.util.Arrays.sort(arr)
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
            var i = 0
            while (i < arr.length) {
              var j = i + 1
              while (j < arr.length) { out += ((arr(i), arr(j))); j += 1 }
              i += 1
            }
            out.iterator
          }
          .toDF("a_id", "b_id")
          .groupBy(col("a_id"), col("b_id"))
          .agg(count(lit(1)).as("inter"))
          .write.mode("overwrite").format("noop").save()
      }
      sh.unpersist()
    }
    spark.stop()
  }
}
