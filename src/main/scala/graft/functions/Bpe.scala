package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: real merge training (Sennrich et al.
  * 2016 — the GPT-2/RoBERTa vocabulary algorithm) + distributed encode.
  *
  * Production shape: merges train on a BOUNDED DETERMINISTIC SAMPLE
  * collected to the driver (the lowest-`sampleDocs` doc_ids — the same
  * bounded-artifact idiom as IVF centroids; GPT-2's vocabulary was
  * itself trained on a corpus subset), then broadcast; the corpus-wide
  * ENCODE is the distributed part — a zero-shuffle typed pass applying
  * merges per word. Training is exact greedy BPE with a total
  * deterministic tie-break (count desc, pair lexicographic), so retries
  * and re-runs reproduce the identical merge table.
  */
object Bpe {

  type Pair = (String, String)

  /** End-of-word marker (Sennrich §3.2) — keeps word-final subwords
    * distinct so decoding can restore word boundaries. */
  val EndOfWord = "</w>"

  /** Word → initial symbol sequence: one symbol per char + EOW. */
  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Greedy BPE merge training on a word-frequency table. Returns the
    * ordered merge list (earlier = higher priority at encode time). */
  def trainOnCounts(wordCounts: Map[String, Long], numMerges: Int): Vector[Pair] = {
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => symbols(w) -> c }
    val merges = Vector.newBuilder[Pair]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[Pair, Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // total deterministic order: count desc, then pair lexicographic
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Encode one word with a rank table: repeatedly merge the
    * lowest-rank adjacent pair (the standard BPE encode loop). */
  def encodeWord(word: String, rank: Map[Pair, Int]): Vector[String] = {
    var syms = symbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Train merges on the deterministic lowest-`sampleDocs` ids. */
  def trainMerges(docs: DataFrame, numMerges: Int,
      sampleDocs: Int): Vector[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sample = docs
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .filter(_._1 < sampleDocs)
      .collect()
    val wc = scala.collection.mutable.HashMap.empty[String, Long]
    sample.foreach { case (_, text) =>
      text.trim.toLowerCase.split("\\s+").foreach { w =>
        wc.update(w, wc.getOrElse(w, 0L) + 1L)
      }
    }
    trainOnCounts(wc.toMap, numMerges)
  }

  /** Corpus-wide encode with a broadcast merge table: per doc, subword
    * count, distinct-subword count, and a position-weighted checksum
    * pinning the exact subword SEQUENCE (Σ (pos+1)·(fnv64(sub) mod
    * 65536) — arrays would defeat the row-sorted hash compare).
    * Zero-shuffle: one typed pass, any corpus size. */
  def encode(docs: DataFrame, merges: Vector[Pair]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val r = bc.value
        var n = 0L
        var checksum = 0L
        val distinct = scala.collection.mutable.HashSet.empty[String]
        text.trim.toLowerCase.split("\\s+").foreach { w =>
          encodeWord(w, r).foreach { sub =>
            n += 1
            checksum += n * (graft.operators.Dedup.fnv64(sub) & 0xFFFFL)
            distinct += sub
          }
        }
        (id, n, distinct.size.toLong, checksum)
      }
      .toDF("doc_id", "n_subwords", "n_distinct_subwords", "subword_checksum")
  }
}
