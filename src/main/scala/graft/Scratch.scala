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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()

    for (_ <- 1 to 2) {
      val hashes = time("simHashesFromDocs") {
        val h = Dedup.simHashesFromDocs(docs); h.cache().count(); h
      }
      val banded = time("banding") {
        val nibbleStructs = array((0 until 16).map { bi =>
          struct(lit(bi).as("band_idx"),
            shiftright(col("simhash"), bi * 4).bitwiseAND(0xF).as("band_val"))
        }: _*)
        val b = hashes
          .select(col("doc_id"), col("simhash"), explode(nibbleStructs).as("b"))
          .select(col("doc_id"), col("simhash"),
            col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
        b.cache().count(); b
      }
      val candidates = time("candidate join") {
        val a = banded.as("a"); val b = banded.as("b")
        val c = a.join(b,
            col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
          .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 15)
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
        c.cache().count(); c
      }
      println(s"[scratch] n_candidates=${candidates.count()}")
      val candidates2 = time("candidate grouped-flatmap") {
        import spark.implicits._
        val c = hashes.select(col("doc_id"), col("simhash"))
          .as[(Long, Long)]
          .flatMap { case (id, sh) =>
            (0 until 16).iterator.map(bi =>
              (bi.toLong * 16 + ((sh >>> (bi * 4)) & 0xFL), id, sh))
          }
          .toDF("bucket", "doc_id", "simhash")
          .groupBy(col("bucket"))
          .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
          .select(col("members"))
          .as[Seq[(Long, Long)]]
          .flatMap { members =>
            val arr = members.toArray
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
            var i = 0
            while (i < arr.length) {
              var j = i + 1
              while (j < arr.length) {
                val (idA, shA) = arr(i); val (idB, shB) = arr(j)
                if (java.lang.Long.bitCount(shA ^ shB) <= 15) {
                  if (idA < idB) out += ((idA, idB))
                  else if (idB < idA) out += ((idB, idA))
                }
                j += 1
              }
              i += 1
            }
            out.iterator
          }
          .toDF("a_id", "b_id")
          .distinct()
        c.cache().count(); c
      }
      println(s"[scratch] n_candidates2=${candidates2.count()}")
      val sh = time("docShingles") { val s = Dedup.docShingles(docs); s.cache().count(); s }
      time("verify") {
        Dedup.verifyCandidates(candidates, sh, 0.8)
          .write.mode("overwrite").format("noop").save()
      }
      hashes.unpersist(); banded.unpersist(); candidates.unpersist(); sh.unpersist()
    }
    spark.stop()
  }
}
