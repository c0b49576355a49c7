package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for d19_span_removal's 100x stress step (the
  * d2/c22 playbook): re-runs the operator's stages on the x30 and
  * x100 corpora and prints the DATA sizes each stage produces (span
  * rows, duplicate span hashes, covered-position rows, output rows)
  * next to per-stage wall times. If the data curve is linear while
  * the x100 wall is super-linear, the step is the single-JVM memory
  * hierarchy (shuffle spill past the execution-memory cliff), not a
  * plan defect — the same attribution d2 carries. Run:
  * `sbt "runMain graft.ProbeD19 /tmp/graft-stress-30x /tmp/graft-stress-100x"`.
  */
object ProbeD19 {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft-stress-30x", "/tmp/graft-stress-100x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { dir =>
      def time[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"[probe-d19] $dir $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text").cast("string"))
      val spans = docs.as[(Long, String)].flatMap { case (id, text) =>
        val t = text.trim.toLowerCase.split("\\s+")
        if (t.length < 8) Iterator.empty
        else t.sliding(8).zipWithIndex.map { case (w, i) =>
          (id, i.toLong, graft.functions.Fnv64.hashBytes(
            w.mkString(" ").getBytes("UTF-8")))
        }
      }.toDF("doc_id", "idx", "wh")
      val nSpans = time("spans")(spans.count())
      val dup = spans.groupBy(col("wh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("wh"))
      val nDup = time("dup-hashes")(dup.count())
      val covered = spans.join(dup, Seq("wh"), "left_semi")
        .select(col("doc_id"),
          explode(sequence(col("idx"), col("idx") + lit(7))).as("pos"))
      val nCovered = time("covered-pos")(covered.count())
      val nCovDocs = time("covered-docs")(
        covered.groupBy("doc_id").agg(count(lit(1))).count())
      val full = time("full-operator")(
        graft.operators.Dedup.duplicateSpanRemoval(
          spark.read.parquet(s"$dir/documents.parquet")).count())
      println(s"[probe-d19] $dir spans=$nSpans dupHashes=$nDup " +
        s"coveredPos=$nCovered coveredDocs=$nCovDocs outRows=$full")
    }
    spark.stop()
  }
}
