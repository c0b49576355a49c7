package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec-level closure for the catalog row whose output DuckDB cannot
  * replay (CORRECTNESS records it `no_oracle`):
  *
  *  - k1_sketch_rollup: its 256-capacity KLL compacts, making the
  *    kept-item set arrival-order-dependent — no SQL replay exists.
  *    Closure = a self-verifying invariant against the EXACT
  *    distribution: every reported quantile must sit within the same
  *    rank-error envelope SketchesSpec proves for the merged-sketch
  *    regime, and the HLL half within the established 5% band.
  *
  * t17_bpe_tokenize gained a FULL equality oracle in round 19 (the t23
  * generator unrolled to 200 merge rounds, ~34s in DuckDB — the cost
  * rides the fixed 100-doc training sample, not corpus scale); its
  * algebraic invariants below are kept as extra pinning — they'd
  * localize a failure the hash gate can only detect.
  */
class NoOracleClosureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("k1: compacted KLL quantiles hold the merged-regime rank bound; " +
      "HLL users within 5% of exact") {
    val out = SparkEntry.queries("k1_sketch_rollup")(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type").cast("string"),
        col("value").cast("double"), col("user_id").cast("long"))
      .collect()
      .groupBy(_.getString(0))
    out.foreach { row =>
      val t = row.getString(0)
      val rows = ev(t)
      val vals = rows.map(_.getDouble(1)).sorted
      val n = vals.length
      for ((q, est) <- Seq((0.5, row.getDouble(2)), (0.95, row.getDouble(3)))) {
        // rank of the estimate in the exact sorted distribution; the 3%
        // envelope is SketchesSpec's proven merged-sketch bound (k=256,
        // 16-way merge)
        val rank = vals.count(_ <= est)
        assert(math.abs(rank - q * n) <= 0.03 * n,
          s"$t p$q: est $est rank $rank target ${q * n} of $n")
      }
      val exactUsers = rows.map(_.getLong(2)).distinct.length
      val estUsers = row.getLong(1)
      assert(math.abs(estUsers - exactUsers).toDouble / exactUsers < 0.05,
        s"$t users: est $estUsers exact $exactUsers")
    }
  }

  test("t17: the 200-merge table is well-founded and duplicate-free; " +
      "encode is lossless over every corpus word") {
    import graft.functions.Bpe
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.trainMerges(docs, numMerges = 200, sampleDocs = 100)
    assert(merges.length <= 200)
    assert(merges.distinct.length === merges.length, "repeated merge")
    // well-founded: each component is a single char, the EOW marker, or
    // the joined product of an EARLIER merge — so the table is a valid
    // derivation chain, not an arbitrary string list
    val produced = scala.collection.mutable.HashSet.empty[String]
    merges.foreach { case (a, b) =>
      for (comp <- Seq(a, b))
        assert(comp.length == 1 || comp == Bpe.EndOfWord ||
          produced.contains(comp) ||
          (comp.endsWith(Bpe.EndOfWord) &&
            comp.length == Bpe.EndOfWord.length + 1),
          s"component '$comp' of merge ($a,$b) has no derivation")
      produced += (a + b)
    }
    // a table shorter than 200 means training SATURATED (no adjacent
    // pair left to merge): then every sampled word must encode to ONE
    // symbol — the strongest possible consistency between trainer and
    // encoder on the training set
    val rank = merges.zipWithIndex.toMap
    if (merges.length < 200) {
      val sampleWords = docs
        .filter(col("doc_id") < 100).select(col("text").cast("string"))
        .collect().iterator
        .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty).toSet
      sampleWords.foreach { w =>
        val subs = Bpe.encodeWord(w, rank)
        assert(subs.length === 1,
          s"saturated table but '$w' still splits: $subs")
      }
    }
    val words = docs.select(col("text").cast("string")).collect()
      .iterator.flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).toSet
    // the synthetic corpus draws from a small closed vocabulary (31
    // distinct words at sf0.01) — which is exactly why training
    // saturates; the guard only rejects an empty/degenerate read
    assert(words.size > 20, s"suspiciously small vocabulary ${words.size}")
    words.foreach { w =>
      val subs = Bpe.encodeWord(w, rank)
      assert(subs.mkString === w + Bpe.EndOfWord,
        s"lossy encode of '$w': $subs")
    }
  }
}
