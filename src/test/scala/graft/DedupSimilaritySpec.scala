package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("duplicate-span coverage: planted shared span counted exactly, unique docs zero") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"boiler$i").mkString(" ")
    val rows = Seq(
      (1L, s"alpha beta gamma $shared delta"),          // span at idx 3, 12 tokens
      (2L, s"$shared epsilon zeta"),                    // span at idx 0, 10 tokens
      (3L, "wholly unique words that never repeat anywhere else at all"))
    val out = Dedup.duplicateSpanCoverage(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 12 tokens -> 5 windows; ONLY the exact planted window is
    // duplicated (neighboring windows mix in unique context words);
    // its 8 tokens are covered
    assert(out(1L) === ((5L, 1L, 8L, 12L)))
    assert(out(2L) === ((3L, 1L, 8L, 10L)))
    assert(out(3L) === ((3L, 0L, 0L, 10L)))
  }

  test("soft dedup: all docs kept, member counts structural, weights exact reciprocals") {
    val out = SparkEntry.queries("d17_soft_dedup")(spark, sf)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    // soft dedup removes nothing — the point of the operator
    assert(out.count() === total)
    // n_members matches each component's actual row count
    val mismatch = out.groupBy(col("comp"))
      .agg(count(lit(1)).as("n"), first(col("n_members")).as("m"))
      .filter(col("n") =!= col("m")).count()
    assert(mismatch === 0L)
    // weight is exactly the advertised reciprocal (same IEEE expression)
    assert(out.filter(col("weight") =!= lit(1.0) / col("n_members"))
      .count() === 0L)
    // singletons carry full weight
    assert(out.filter(col("n_members") === 1 && col("weight") =!= 1.0)
      .count() === 0L)
  }

  test("containment pairs: quoted subset scores 1.0 forward, tiny backward") {
    import spark.implicits._
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")      // 8 shingles
    val long = s"intro words here $quote plus trailing unique tail tokens"
    val toy = Seq(
      (1L, quote),                                  // wholly quoted in 2
      (2L, long),
      (3L, "unrelated text with no shared trigrams at all whatsoever"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(toy, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every shingle of doc 1 appears in doc 2 -> C(1->2) = 1.0
    assert(out((1L, 2L)) === 1.0)
    // doc 2 has many shingles outside the quote -> C(2->1) < 0.8 (absent)
    assert(!out.contains((2L, 1L)))
    assert(out.keySet === Set((1L, 2L)))
    // symmetric Jaccard misses the same pair at the same threshold —
    // the reason this operator exists
    assert(Dedup.jaccardPairs(toy, 0.8).count() === 0L)
  }

  test("edit-distance pairs: exact distances, banding complete, candidate path agrees") {
    import spark.implicits._
    val toy = Seq(
      (1L, "kitten"), (2L, "sitting"),            // the classic: lev 3
      (3L, "flaw"), (4L, "lawn"),                 // lev 2
      (5L, "abcdefghij"), (6L, "abcdefghij"),     // identical: lev 0
      (7L, "completely different content here"),  // far from everything
      (8L, "zzzz")                                // lev("zzzz","lawn")=4 > 3
    ).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(toy, maxDist = 3)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out((1L, 2L)) === 3L)
    assert(out((3L, 4L)) === 2L)
    assert(out((5L, 6L)) === 0L)
    assert(!out.keySet.exists(p => p._1 == 7L || p._2 == 7L))
    assert(!out.contains((4L, 8L)) && !out.contains((3L, 8L)))
    // banding is complete: equals the naive all-pairs reference on the
    // real corpus (cross join + plain levenshtein, no banding at all)
    val banded = Dedup.editDistancePairs(docs, maxDist = 16)
      .as[(Long, Long, Long)].collect().toSet
    val base = docs.select(col("doc_id").as("a_id"), col("text").as("ta"))
    val naive = base.crossJoin(
        docs.select(col("doc_id").as("b_id"), col("text").as("tb")))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("ta"), col("tb")).cast("long").as("lev"))
      .filter(col("lev") <= 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === naive)
    // candidate-fed path (the LSH-composed production shape) agrees on
    // the pairs it is given; a planted non-matching candidate is
    // dropped by the verify, an unknown id never joins
    val matched = naive.map(t => (t._1, t._2))
    val nonMatch = (for {
      a <- 0L to 5L; b <- (a + 1) to 6L if !matched.contains((a, b))
    } yield (a, b)).head
    val cands = (matched + nonMatch + ((1L, 999999L))).toSeq
      .toDF("a_id", "b_id")
    val viaCands = Dedup.editDistancePairs(docs, maxDist = 16,
        candidates = Some(cands))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaCands === naive)
  }

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

  test("128-bit simhash pairs equal exact jaccard pairs at 0.8, with tighter bands") {
    val exact = Dedup.jaccardPairs(docs, 0.8).select("a_id", "b_id")
    val sim = Dedup.simHashPairs128(docs, 31, 0.8).select("a_id", "b_id")
    assert(exact.exceptAll(sim).isEmpty && sim.exceptAll(exact).isEmpty)
    // the widened sketch must actually be more selective: byte bands
    // admit far fewer same-bucket collisions than nibble bands
    import spark.implicits._
    val n = docs.count()
    def bucketPairs(banded: org.apache.spark.sql.DataFrame): Long =
      banded.groupBy("bucket").count()
        .agg(sum(col("count") * (col("count") - 1))).first().getLong(0)
    val nibble = Dedup.simHashesFromDocs(docs).as[(Long, Long)]
      .flatMap { case (id, h) =>
        (0 until 16).iterator.map(bi => (bi.toLong * 16 + ((h >>> (bi * 4)) & 0xFL), id))
      }.toDF("bucket", "doc_id")
    val byte8 = Dedup.simHashes128FromDocs(docs).as[(Long, Long, Long)]
      .flatMap { case (id, lo, hi) =>
        (0 until 16).iterator.map { bi =>
          val b = if (bi < 8) (lo >>> (bi * 8)) & 0xFFL else (hi >>> ((bi - 8) * 8)) & 0xFFL
          (bi.toLong * 256 + b, id)
        }
      }.toDF("bucket", "doc_id")
    assert(n > 0 && bucketPairs(byte8) < bucketPairs(nibble))
  }

  test("simhash pairs: duplicate doc_id rows never emit a self-pair") {
    import spark.implicits._
    // the same doc_id appears twice (identical text — identical simhash),
    // plus a genuine near-dup pair; the within-bucket equal-hash loop
    // must skip (a, a) while keeping (a, b)
    val base = "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9 tok10 " +
      "tok11 tok12 tok13 tok14 tok15 tok16 tok17 tok18 tok19 tok20"
    val toy = Seq(
      (1L, base), (1L, base),                    // duplicate doc_id rows
      (2L, base),                                // true dup of doc 1
      (3L, "entirely different words with zero shared trigram shingles here"))
      .toDF("doc_id", "text")
    val out = Dedup.simHashPairs(toy, 15, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!out.exists(p => p._1 == p._2), s"self-pair emitted: $out")
    assert(out === Set((1L, 2L)))
    // same contract on the 128-bit route
    val out128 = Dedup.simHashPairs128(toy, 31, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!out128.exists(p => p._1 == p._2), s"self-pair emitted: $out128")
    assert(out128 === Set((1L, 2L)))
  }

  test("simhash wide routing: opt-in only, and wide recall >= 0.95 vs complete banding at 25k docs") {
    import spark.implicits._
    // deterministic 25k-doc corpus: 24.6k unique docs + 200 planted
    // near-dup pairs (one token swapped in 40 -> ~3 of 38 trigram
    // shingles change -> jaccard ~0.85, simhash hamming small)
    val rnd = new scala.util.Random(42)
    def doc(): Array[String] = Array.fill(40)(s"w${rnd.nextInt(50000)}")
    val uniques = (0L until 24600L).map(i => (i, doc().mkString(" ")))
    val planted = (0 until 200).map { i =>
      val t = doc()
      val a = (25000 + 2 * i).toLong
      val b = a + 1
      val orig = t.mkString(" ")
      t(20) = "swapped"
      (a, orig, b, t.mkString(" "))
    }
    val rows = uniques ++ planted.flatMap(p => Seq((p._1, p._2), (p._3, p._4)))
    val corpus = rows.toDF("doc_id", "text")
      .repartition(32).localCheckpoint()
    val plantedPairs = planted.map(p => (p._1, p._3)).toSet

    // complete nibble banding (the default: no finite limit passed)
    val narrow = Dedup.simHashPairs(corpus, 15, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // completeness against the operator's CONTRACT: every planted pair
    // that really is within hamming 15 AND jaccard >= 0.8 must be
    // found (a random swap occasionally pushes a pair past a gate —
    // such pairs are legitimately absent, so compute eligibility
    // exactly on the 400-doc planted subset first)
    val plantedDf = planted.flatMap(p => Seq((p._1, p._2), (p._3, p._4)))
      .toDF("doc_id", "text")
    val hams = Dedup.simHashesFromDocs(plantedDf)
      .as[(Long, Long)].collect().toMap
    val jacOk = Dedup.jaccardPairs(plantedDf, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val eligible = plantedPairs.filter(p => jacOk.contains(p) &&
      java.lang.Long.bitCount(hams(p._1) ^ hams(p._2)) <= 15)
    assert(eligible.size >= 190, // the corpus really does plant near-dups
      s"only ${eligible.size}/200 planted pairs are contract-eligible")
    assert(eligible.subsetOf(narrow),
      s"complete banding missed ${(eligible -- narrow).size} eligible pairs")

    // opt-in wide route (same call d4 makes above 20k docs)
    val wide = Dedup.simHashPairs(corpus, 15, 0.8, autoWideDocLimit = 20000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // the wide route keeps the exact 64-bit hamming filter + exact
    // jaccard verify, so its output is a SUBSET of the complete route —
    // only candidate generation is approximate
    assert(wide.subsetOf(narrow),
      s"wide route emitted pairs outside the complete set: ${wide -- narrow}")
    val recall = if (narrow.isEmpty) 1.0 else wide.size.toDouble / narrow.size
    assert(recall >= 0.95, s"wide-route recall $recall < 0.95 " +
      s"(narrow=${narrow.size}, wide=${wide.size})")
  }

  test("segment dedup removes planted boilerplate everywhere, leaves unique docs intact") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8" // exactly one 8-token segment
    val tail1 = "alpha beta gamma delta epsilon zeta eta theta"
    val tail3 = "unique tokens only nine ten eleven twelve thirteen"
    val base = Seq(
      (1L, s"$boiler $tail1"),
      (2L, s"$boiler one two three four five six seven"),
      (3L, tail3)).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(base, segTokens = 8, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_segments") === 2L)
    assert(out(1L).getAs[Long]("n_removed") === 1L)
    assert(out(1L).getAs[String]("clean_fp") === md5hex(tail1))
    assert(out(2L).getAs[Long]("n_removed") === 1L)
    assert(out(3L).getAs[Long]("n_removed") === 0L)
    assert(out(3L).getAs[String]("clean_fp") === md5hex(tail3))
  }

  test("segment dedup: a fully-boilerplate doc reassembles to the empty fingerprint") {
    import spark.implicits._
    val seg = "c1 c2 c3 c4 c5 c6 c7 c8"
    val out = Dedup.segmentDedup(
        Seq((1L, seg), (2L, seg)).toDF("doc_id", "text"), 8, 2)
      .filter(col("doc_id") === 1L).head()
    assert(out.getAs[Long]("n_removed") === 1L)
    // md5 of "" — both engines coalesce the empty reassembly to ''
    assert(out.getAs[String]("clean_fp") === "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("bloom decontamination removes every contaminated doc, over-removal bounded") {
    import graft.functions.{Bloom, TextFunctions => TF}
    val fp = TF.fingerprint(col("text"))
    val blob = docs.filter(col("doc_id") % 20 === 0)
      .agg(Bloom.bloom_build(fp, 4096, 1e-4)).head().getAs[Array[Byte]](0)
    val survivors = docs.select(col("doc_id"), fp.as("fp"))
      .filter(!Bloom.bloom_might_contain(lit(blob), col("fp")))
    val exact = docs.select(col("doc_id"), fp.as("fp"))
      .join(docs.filter(col("doc_id") % 20 === 0).select(fp.as("bfp")),
        col("fp") === col("bfp"), "left_anti")
    // no false negatives: survivors never include a contaminated fp
    assert(survivors.exceptAll(exact).isEmpty,
      "bloom survivors must be a subset of the exact anti-join")
    // bounded over-removal at fpp=1e-4 on this corpus: none expected
    assert(exact.exceptAll(survivors).count() <= (0.01 * docs.count()).toLong)
  }

  test("n-gram decontamination survivors are a subset of the doc-fingerprint survivors") {
    // sharing an 8-gram is implied by sharing the whole text, so d12
    // must remove everything d6 removes (and may remove more: partial
    // or embedded benchmark leakage)
    val d6 = SparkEntry.queries("d6_decontaminate")(spark, sf).select("doc_id")
    val d12 = SparkEntry.queries("d12_ngram_decontaminate")(spark, sf)
      .select("doc_id")
    assert(d12.exceptAll(d6).isEmpty,
      "a doc with the exact benchmark fingerprint must also fail the n-gram check")
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

  test("embedding decontamination agrees with radius search; planted eval copy is dropped") {
    import spark.implicits._
    val thr = 0.3
    val eval = emb.filter(col("vec_id") % 7 === 0)
    // plant an exact copy of an eval vector in the corpus: must be dropped
    val evalRow = eval.select(col("embedding")).head().getSeq[Float](0)
    val planted = Seq((999999L, evalRow)).toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id"), col("embedding")).union(planted)
    val survivors = Dedup.embeddingDecontaminate(corpus, eval, thr)
    val survivorIds = survivors.select("vec_id").as[Long].collect().toSet
    assert(!survivorIds.contains(999999L))
    // survivors' audit column honors the threshold
    assert(survivors.filter(col("max_sim") >= thr).count() === 0)
    // cross-operator agreement: dropped = corpus ids hit by a radius
    // search from the eval side at the same tau (disjoint id spaces, so
    // rangeSearch's self-pair exclusion never fires)
    val contaminated = Similarity.rangeSearch(corpus, eval, thr)
      .select("neighbor_id").as[Long].collect().toSet
    val corpusIds = corpus.select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(survivorIds === (corpusIds -- contaminated))
    // empty eval side is a contract violation, not a silent keep-all
    intercept[IllegalArgumentException] {
      Dedup.embeddingDecontaminate(corpus, eval.filter(col("vec_id") < 0), thr)
    }
  }

  test("nn join: right-side-only neighbors, exact sims, planted twin found at rank 1") {
    import spark.implicits._
    val left = emb.filter(col("vec_id") % 2 === 1)
    // plant an even-id exact twin of odd vector 1: identical vectors
    // share every LSH bucket, so the twin MUST surface as its rank-1
    val v1 = emb.filter(col("vec_id") === 1).select(col("embedding")).head().getSeq[Float](0)
    val right = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
      .union(Seq((888888L, v1)).toDF("vec_id", "embedding"))
    val out = Similarity.nnJoin(left, right, k = 4, bits = 8).cache()
    val rightIds = right.select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(out.select("neighbor_id").as[Long].collect().forall(rightIds.contains))
    assert(out.filter(col("query_id") % 2 === 0).count() === 0)
    val top1 = out.filter(col("query_id") === 1 && col("rank") === 1)
      .as[(Long, Long, Int, Double)].head()
    assert(top1._2 === 888888L && top1._4 > 0.999999)
    // ranks contiguous from 1, bounded by k, ordered by (sim desc, id)
    out.groupBy("query_id").agg(collect_list(struct(col("rank"), col("sim"), col("neighbor_id"))).as("rs"))
      .as[(Long, Seq[(Int, Double, Long)])].collect().foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._1)
        assert(sorted.map(_._1) == (1 to sorted.length) && sorted.length <= 4)
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a._2 > b._2 || (a._2 == b._2 && a._3 < b._3))
          case _ =>
        }
      }
    // every emitted sim is the exact cosine of the pair
    val recomputed = out.join(right.select(col("vec_id").as("neighbor_id"),
        graft.functions.VectorFunctions.toDoubleVec(col("embedding")).as("nv")), "neighbor_id")
      .join(left.select(col("vec_id").as("query_id"),
        graft.functions.VectorFunctions.toDoubleVec(col("embedding")).as("qv")), "query_id")
      .filter(col("sim") =!= graft.functions.VectorFunctions.cosine(col("qv"), col("nv")))
    assert(recomputed.count() === 0)
    out.unpersist()
  }

  test("knn label vote: majority of the exact neighbor labels, ties to smallest label") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 5)
    val k = 7
    val got = Similarity.knnClassify(emb, q, k)
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // replay the vote from the knn output + a label lookup
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val knn = Similarity.bruteForceKnn(emb, q, k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    val want = knn.groupBy(_._1).map { case (qid, ns) =>
      val votes = ns.map(n => labels(n._2)).groupBy(identity)
        .map { case (l, xs) => (l, xs.length.toLong) }
      val (pl, nv) = votes.toSeq.maxBy { case (l, n) => (n, -l) }
      (qid, labels(qid), pl, nv)
    }.toArray.sortBy(_._1)
    assert(got === want)
    got.foreach { case (_, _, _, nv) => assert(nv >= 1L && nv <= k.toLong) }
  }

  test("mmr: pick 1 is the knn top hit; a planted near-copy of it is deferred") {
    import spark.implicits._
    // query q points along (1,0); a and a2 are near-identical high-relevance
    // hits; b is less relevant but diverse. Plain top-2 = {a, a2}; MMR with
    // lambda 0.5 must pick {a, b}.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),   // the query
      (1L, Array(0.99f, 0.14f, 0.0f), 0), // a
      (2L, Array(0.99f, 0.141f, 0.0f), 0),// a2: near-copy of a
      (3L, Array(0.7f, 0.0f, 0.71f), 0)   // b: diverse
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrSelect(rows, rows.filter(col("vec_id") === 0L),
        poolK = 3, k = 2, lam = 0.5)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(r => (r._2, r._3)).toSeq === Seq((1, 1L), (2, 3L)))
    // pick 1 equals the brute-force rank-1 neighbor
    val top1 = Similarity.bruteForceKnn(rows, rows.filter(col("vec_id") === 0L), 1)
      .select(col("neighbor_id")).as[Long].head()
    assert(got.head._3 === top1)
    // on real data: picks are distinct and pick 1 matches knn rank 1
    val e = emb
    val mmr = Similarity.mmrSelect(e, e.filter(col("vec_id") < 4), 8, 4, 0.5)
      .as[(Long, Int, Long, Double)].collect()
    mmr.groupBy(_._1).foreach { case (q, picks) =>
      assert(picks.map(_._3).distinct.length === picks.length, s"q=$q")
      assert(picks.length === 4, s"q=$q")
    }
    val rank1 = Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 4), 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toMap
    mmr.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(n === rank1(q), s"q=$q")
    }
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

  test("lsh parameter sweep: invariants across widths + exact eval math") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 8)
    val sweep = Similarity.lshParameterSweep(emb, q, tau = 0.25,
        bitsList = Seq(2, 4, 8))
      .orderBy("bits")
      .select("bits", "n_candidates", "n_true", "n_hit", "precision_bp",
        "recall_bp")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(sweep.map(_._1).toSeq === Seq(2, 4, 8))
    // n_true is width-independent and equals the exact radius search
    val nTrue = Similarity.rangeSearch(emb, q, 0.25).count()
    assert(sweep.forall(_._3 === nTrue))
    // a width-b bucket refines width-(b-1): candidates shrink
    // monotonically, hits can only be lost
    assert(sweep(0)._2 >= sweep(1)._2 && sweep(1)._2 >= sweep(2)._2)
    assert(sweep(0)._4 >= sweep(1)._4 && sweep(1)._4 >= sweep(2)._4)
    // basis points are exactly the integer formulas
    sweep.foreach { case (_, cand, tru, hit, p, r) =>
      assert(p === (if (cand == 0) 0L else hit * 10000 / cand))
      assert(r === (if (tru == 0) 0L else hit * 10000 / tru))
      assert(hit <= math.min(cand, tru))
    }
  }

  test("embedding-cosine exact pairs: ordered ids, sims within threshold") {
    val pairs = Dedup.embeddingCosinePairs(emb, 0.3).cache()
    assert(pairs.filter(col("a_id") >= col("b_id")).count() === 0)
    assert(pairs.filter(col("sim") < 0.3).count() === 0)
    assert(pairs.count() > 0)
  }

  test("embedding-cosine exact pairs: blocked path is bit-identical, no driver corpus") {
    // above broadcastLimit the operator must route to the triangle
    // block-join (no collect() of the corpus); results — ids AND the
    // strict-fold sims — must be bit-identical to the broadcast path
    val viaBroadcast = Dedup.embeddingCosinePairs(emb, 0.3)
      .orderBy("a_id", "b_id").collect().toSeq
    val viaBlocks = Dedup.embeddingCosinePairs(emb, 0.3, broadcastLimit = 1)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(viaBroadcast === viaBlocks)
    // and directly at an awkward block count (ids not divisible evenly)
    val direct = Dedup.blockedCosinePairs(emb, 0.3, blocks = 7)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(viaBroadcast === direct)
  }

  test("embedding LSH pairs: sound on the raw corpus, high recall on planted near-dups") {
    // soundness: every LSH survivor is a true pair (exact verify in-loop),
    // even in the hostile low-cosine regime of the random test corpus
    val exactLow = Dedup.embeddingCosinePairs(emb, 0.3).select("a_id", "b_id")
    val lshLow = Dedup.embeddingLshPairs(emb, 0.3, bands = 8, bitsPerBand = 8)
      .select("a_id", "b_id")
    assert(lshLow.exceptAll(exactLow).isEmpty)

    // recall: sign-hyperplane LSH targets HIGH-cosine near-dups (the dedup
    // regime, θ≈0.9). The synthetic corpus is near-orthogonal (max cosine
    // ≈0.6), so plant near-dups: v' = 0.95·v + 0.05·v_next ⇒ cosine ≈ 0.99.
    // P(band survives) = (1 - acos(.99)/π)^8 ≈ 0.74 ⇒ 8 bands miss ~1e-5.
    import spark.implicits._
    val base = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val planted = base.take(50).zipWithIndex.map { case ((id, v), i) =>
      val w = base((i + 1) % base.length)._2
      (id + 100000, v.zip(w).map { case (x, y) => 0.95f * x + 0.05f * y })
    }
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize((base ++ planted).toIndexedSeq.map {
        case (id, v) => org.apache.spark.sql.Row(id, v)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val exact = Dedup.embeddingCosinePairs(all, 0.9).select("a_id", "b_id").cache()
    val lsh = Dedup.embeddingLshPairs(all, 0.9, bands = 8, bitsPerBand = 8)
      .select("a_id", "b_id").cache()
    val nExact = exact.count()
    assert(nExact >= 50) // the planted pairs are all above 0.9
    val hit = exact.intersect(lsh).count()
    assert(hit.toDouble / nExact >= 0.95, s"recall $hit/$nExact")
  }

  test("IVF k-means refinement: deterministic, objective non-decreasing, knn contract holds") {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map(_._2.map(_.toDouble).toArray)
    def objective(cs: Array[Array[Double]]): Double = vecs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      cs.map(c => v.zip(c).map { case (a, b) => a * b }.sum / n).max
    }.sum
    val c0 = Similarity.ivfCentroids(emb, nCells = 8)
    val c2 = Similarity.ivfCentroids(emb, nCells = 8, iters = 2)
    val c2b = Similarity.ivfCentroids(emb, nCells = 8, iters = 2)
    assert(c2.map(_.toSeq).toSeq === c2b.map(_.toSeq).toSeq) // deterministic
    // each Lloyd sweep can only improve the spherical k-means objective
    assert(objective(c2) >= objective(c0) - 1e-9,
      s"objective regressed: ${objective(c0)} -> ${objective(c2)}")
    // refined knn keeps the output contract
    val q = emb.filter(col("vec_id") < 3)
    val knn = Similarity.ivfKnn(emb, q, k = 4, nCells = 8, nProbe = 3, kmeansIters = 2)
    assert(knn.count() === 12)
    assert(knn.filter(col("neighbor_id") === col("query_id")).count() === 0)
  }

  test("multi-probe embedding dedup: superset of single-probe, lifts recall at harsh banding") {
    import spark.implicits._
    val base = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val planted = base.take(50).zipWithIndex.map { case ((id, v), i) =>
      val w = base((i + 1) % base.length)._2
      (id + 100000, v.zip(w).map { case (x, y) => 0.95f * x + 0.05f * y })
    }
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize((base ++ planted).toIndexedSeq.map {
        case (id, v) => org.apache.spark.sql.Row(id, v)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    // 2 bands x 12 bits: deliberately harsh — P(band survives) ~ .55,
    // so single-probe misses a visible share of the planted pairs
    val single = Dedup.embeddingLshPairs(all, 0.9, bands = 2, bitsPerBand = 12)
      .select("a_id", "b_id").cache()
    val multi = Dedup.embeddingLshPairs(all, 0.9, bands = 2, bitsPerBand = 12,
      probes = 6).select("a_id", "b_id").cache()
    // probing only ADDS candidates; survivors are exact-verified either way
    assert(single.exceptAll(multi).isEmpty, "multi-probe lost a single-probe pair")
    val exact = Dedup.embeddingCosinePairs(all, 0.9).select("a_id", "b_id").cache()
    assert(multi.exceptAll(exact).isEmpty) // soundness at any probe count
    val (rs, rm) = (exact.intersect(single).count(), exact.intersect(multi).count())
    assert(rm >= rs, s"multi-probe recall $rm below single-probe $rs")
    assert(rm.toDouble / exact.count() >= 0.9, s"recall $rm/${exact.count()}")
  }

  test("multi-probe LSH: dominates single-probe, near-full recall on planted neighbors") {
    val q = emb.filter(col("vec_id") < 16)
    val brute = Similarity.bruteForceKnn(emb, q, 4)
      .select("query_id", "neighbor_id").cache()
    val n = brute.count()
    // probing more buckets can only add candidates: recall is monotone
    val r0 = brute.intersect(Similarity.multiProbeLshKnn(emb, q, 4, 8, 0)
      .select("query_id", "neighbor_id")).count()
    val r4 = brute.intersect(Similarity.multiProbeLshKnn(emb, q, 4, 8, 4)
      .select("query_id", "neighbor_id")).count()
    assert(r4 >= r0, s"multi-probe recall $r4/$n below single-probe $r0/$n")

    // planted 0.99-cosine neighbors (the ANN regime): one flip of a
    // low-margin plane recovers nearly every band miss
    import spark.implicits._
    val base = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val planted = base.take(30).zipWithIndex.map { case ((id, v), i) =>
      val w = base((i + 1) % base.length)._2
      (id + 100000L, v.zip(w).map { case (x, y) => 0.95f * x + 0.05f * y })
    }
    val all = (base ++ planted).toSeq.toDF("vec_id", "embedding")
    val queries = all.filter(col("vec_id") >= 100000)
    val mp = Similarity.multiProbeLshKnn(all, queries, k = 1, bits = 8, probes = 4)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted vector's true nearest neighbor is its source
    val found = planted.count { case (pid, _) => mp.get(pid).contains(pid - 100000L) }
    assert(found >= 27, s"found $found/30 planted nearest neighbors")
  }

  test("semantic dedup: sound subset, nClusters=1 is the exact baseline, clusters partition") {
    // soundness: every within-cluster pair is a true pair with the same
    // strict-fold sim — bit-identical rows of the exact pair set
    val exact = Dedup.embeddingCosinePairs(emb, 0.3).cache()
    val sem = Dedup.semanticPairs(emb, 0.3, nClusters = 8).cache()
    assert(sem.exceptAll(exact).isEmpty, "semantic pair not in the exact set")
    // degenerate clustering = no pruning: must reproduce the exact set
    val one = Dedup.semanticPairs(emb, 0.3, nClusters = 1)
    assert(one.exceptAll(exact).isEmpty && exact.exceptAll(one).isEmpty)
    // planted near-dups (cosine ≈ 0.9999 to their source — the dedup
    // regime) land in their source's cluster, SemDeDup's whole premise:
    // a perturbation that small flips the argmax centroid only for
    // sources sitting right on a cluster boundary. Recall stays near
    // complete even though cross-cluster pairs drop by design.
    import spark.implicits._
    val base = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val planted = base.take(50).zipWithIndex.map { case ((id, v), i) =>
      val w = base((i + 1) % base.length)._2
      (id + 100000L, v.zip(w).map { case (x, y) => 0.99f * x + 0.01f * y })
    }
    val all = (base ++ planted).toSeq.toDF("vec_id", "embedding")
    val exactHigh = Dedup.embeddingCosinePairs(all, 0.9).select("a_id", "b_id")
    val semHigh = Dedup.semanticPairs(all, 0.9, nClusters = 8)
      .select("a_id", "b_id")
    val nExact = exactHigh.count()
    assert(nExact >= 50)
    val hit = exactHigh.intersect(semHigh).count()
    assert(hit.toDouble / nExact >= 0.95, s"recall $hit/$nExact")
  }

  test("duplicate components: chains, cliques, disjoint groups, keeper flags") {
    import spark.implicits._
    // components: {1,2,3,4} via a chain (diameter 3 — forces multiple
    // propagation rounds), {10,11,12} as a triangle, {20,21} a lone pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val comps = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(id => comps(id)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(id => comps(id)._1 == 10L))
    assert(Seq(20L, 21L).forall(id => comps(id)._1 == 20L))
    // exactly one keeper per component, and it is the representative
    assert(comps.count(_._2._2) === 3)
    assert(comps.filter(_._2._2).keySet === Set(1L, 10L, 20L))
    // the convergence bound is enforced, not silently truncated
    val longChain = (0L until 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    intercept[IllegalArgumentException](
      Dedup.duplicateComponents(longChain, maxIters = 2).collect())
  }

  test("duplicate components: pointer-halving closes a 41-node chain in O(log n) rounds") {
    import spark.implicits._
    // a near-dup CHAIN (content drift) is the worst case for plain
    // min-label propagation: 40 hops would need 40 rounds and blow the
    // default maxIters=20. Path compression must close it in ~log2(40)+2
    // rounds — well under 10, which this tight budget proves.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comps = Dedup.duplicateComponents(chain, maxIters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size === 41)
    assert((0L to 40L).forall(id => comps(id) == 0L))
  }

  test("scalar-quantized knn: exact rerank sims, high recall, full-cover equals brute force") {
    val q = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceKnn(emb, q, k = 4).cache()
    val sq = Similarity.sqKnn(emb, q, k = 4, rerank = 4).cache()
    // contract: 4 ranked rows per query, no self matches
    assert(sq.count() === brute.count())
    assert(sq.filter(col("neighbor_id") === col("query_id")).count() === 0)
    // wherever SQ found the true neighbor, the reranked sim is
    // BIT-IDENTICAL to brute force (shared strict cosine fold)
    val joined = sq.select(col("query_id"), col("neighbor_id"), col("sim").as("s1"))
      .join(brute.select(col("query_id"), col("neighbor_id"), col("sim").as("s2")),
        Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("s1") =!= col("s2")).count() === 0)
    // recall@4 against brute force: int8 on normalized 64-dim vectors
    // perturbs sims by ~1e-2 worst-case; rerank=4 absorbs it
    val n = brute.count()
    val hit = brute.select("query_id", "neighbor_id")
      .intersect(sq.select("query_id", "neighbor_id")).count()
    assert(hit.toDouble / n >= 0.9, s"recall $hit/$n")
    // rerank window covering the whole corpus ⇒ row-for-row brute force
    val cover = Similarity.sqKnn(emb, q, k = 4,
      rerank = (emb.count() / 4 + 1).toInt)
    assert(cover.exceptAll(brute).isEmpty && brute.exceptAll(cover).isEmpty)
  }

  test("product-quantized knn: exact rerank sims, planted duplicates found, full-cover equals brute force") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceKnn(emb, q, k = 4).cache()
    val pq = Similarity.pqKnn(emb, q, k = 4, m = 8, nCodes = 16, rerank = 8)
      .cache()
    // contract: ranked rows per query, no self matches
    assert(pq.count() === brute.count())
    assert(pq.filter(col("neighbor_id") === col("query_id")).count() === 0)
    // wherever PQ surfaced the true neighbor, the reranked sim is
    // BIT-IDENTICAL to brute force (shared strict cosine fold)
    val joined = pq.select(col("query_id"), col("neighbor_id"), col("sim").as("s1"))
      .join(brute.select(col("query_id"), col("neighbor_id"), col("sim").as("s2")),
        Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("s1") =!= col("s2")).count() === 0)
    // planted exact duplicates: a copy of each query vector at id+10000
    // shares every PQ code with its original, so the ADC scan MUST
    // surface it and the exact rerank MUST rank it first (sim = 1)
    val planted = emb.select(col("vec_id"), col("embedding")).union(
      q.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val found = Similarity.pqKnn(planted, q, k = 4, m = 8, nCodes = 16,
        rerank = 8)
      .filter(col("neighbor_id") === col("query_id") + 10000 &&
        col("rank") === 1)
    assert(found.count() === q.count(), "every planted duplicate must rank first")
    // rerank window covering the whole corpus ⇒ row-for-row brute force
    val cover = Similarity.pqKnn(emb, q, k = 4, m = 8, nCodes = 16,
      rerank = (emb.count() / 4 + 1).toInt)
    assert(cover.exceptAll(brute).isEmpty && brute.exceptAll(cover).isEmpty)
  }

  test("IVF+PQ knn: exact rerank sims, planted duplicates found, full cover equals brute force") {
    val q = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceKnn(emb, q, k = 4).cache()
    val ivfpq = Similarity.ivfPqKnn(emb, q, k = 4, nCells = 16,
      nProbe = 4, m = 8, nCodes = 16, rerank = 8).cache()
    // contract: no self matches, and wherever the routed scan surfaced
    // the true neighbor the reranked sim is BIT-IDENTICAL to brute
    // force (shared strict cosine fold)
    assert(ivfpq.filter(col("neighbor_id") === col("query_id")).count() === 0)
    val joined = ivfpq.select(col("query_id"), col("neighbor_id"), col("sim").as("s1"))
      .join(brute.select(col("query_id"), col("neighbor_id"), col("sim").as("s2")),
        Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("s1") =!= col("s2")).count() === 0)
    // planted exact duplicates: a copy of each query vector lands in
    // the SAME cell with the SAME codes, so the routed ADC scan MUST
    // surface it and the exact rerank MUST rank it first
    val planted = emb.select(col("vec_id"), col("embedding")).union(
      q.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val found = Similarity.ivfPqKnn(planted, q, k = 4, nCells = 16,
        nProbe = 4, m = 8, nCodes = 16, rerank = 8)
      .filter(col("neighbor_id") === col("query_id") + 10000 &&
        col("rank") === 1)
    assert(found.count() === q.count(), "every planted duplicate must rank first")
    // probing EVERY cell with a corpus-covering rerank window ⇒
    // row-for-row brute force (the IVF gate and the PQ scan both drop
    // out, leaving only the exact rerank)
    val cover = Similarity.ivfPqKnn(emb, q, k = 4, nCells = 16,
      nProbe = 16, m = 8, nCodes = 16,
      rerank = (emb.count() / 4 + 1).toInt)
    assert(cover.exceptAll(brute).isEmpty && brute.exceptAll(cover).isEmpty)
  }

  test("mips: augmented-cosine ranking equals raw inner-product ranking " +
      "and augmented corpus norms all equal the max norm") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val res = Similarity.mipsKnn(emb, q, k = 10)
    // re-rank the SAME output rows by raw ip: orders must agree (the
    // augmentation is a per-query positive affine map of ip)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("neighbor_id"))
    val both = res.withColumn("ipRank", row_number().over(w)).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Int]("rank") === r.getAs[Int]("ipRank"),
        s"aug-cos rank diverged from ip rank on $r")
    }
    // every augmented corpus vector has norm M (to float tolerance):
    // ip == aug_sim * ||q|| * M must reconstruct for every row
    val qn = q.select(col("vec_id"),
      graft.functions.VectorFunctions
        .norm(graft.functions.VectorFunctions.toDoubleVec(col("embedding"))).as("qn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = math.sqrt(emb.agg(max(graft.functions.VectorFunctions.dot(
      graft.functions.VectorFunctions.toDoubleVec(col("embedding")),
      graft.functions.VectorFunctions.toDoubleVec(col("embedding")))))
      .head().getDouble(0))
    both.foreach { r =>
      val ip = r.getAs[Double]("ip")
      val rec = r.getAs[Double]("aug_sim") * qn(r.getAs[Long]("query_id")) * m
      assert(math.abs(ip - rec) <= 1e-9 * math.max(1.0, math.abs(ip)),
        s"ip=$ip but aug_sim*|q|*M=$rec")
    }
  }

  test("hard negatives: labels always differ, ranks total, and the " +
      "result equals brute-force knn restricted to other-label vectors") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val res = Similarity.hardNegatives(emb, q, k = 4)
    val rows = res.collect()
    assert(rows.length === q.count() * 4)
    rows.foreach { r =>
      assert(r.getAs[Int]("query_label") !== r.getAs[Int]("neighbor_label"),
        s"same-label negative leaked: $r")
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("neighbor_id"))
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4))
      val byRank = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // differential: rank the FULL neighbor list (k = |corpus|), drop
    // same-label rows, re-rank — the first 4 per query must match
    val full = Similarity.bruteForceKnn(emb, q, k = emb.count().toInt)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), "neighbor_id")
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("ql")), "query_id")
      .filter(col("nl") =!= col("ql"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val expect = full.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select(col("query_id"), col("neighbor_id"), col("rk").as("rank"))
    val got = res.select(col("query_id"), col("neighbor_id"), col("rank"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
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
