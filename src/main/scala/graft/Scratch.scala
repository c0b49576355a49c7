package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 32)
      val brute = Similarity.bruteForceKnn(emb, q, 4)
        .select("query_id", "neighbor_id").cache()
      val n = brute.count()
      for (bits <- Seq(6, 8); probes <- Seq(0, 2, 4, 8).filter(_ <= bits)) {
        val mp = Similarity.multiProbeLshKnn(emb, q, 4, bits, probes)
          .select("query_id", "neighbor_id")
        val hit = brute.intersect(mp).count()
        println(f"[scratch] sf=$sf bits=$bits probes=$probes recall=${hit.toDouble / n}%.3f")
      }
      val single = Similarity.lshKnn(emb, q, 4, 4).select("query_id", "neighbor_id")
      println(f"[scratch] sf=$sf single-probe bits=4 recall=${brute.intersect(single).count().toDouble / n}%.3f")
    }
    spark.stop()
  }
}
