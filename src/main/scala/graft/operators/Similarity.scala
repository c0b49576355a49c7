package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: exact brute-force cosine top-k — the query set is broadcast
  * against the corpus, so the corpus is never shuffled, and each
  * partition is pruned to its local top-k per query before the exact
  * rank window (TopK.perKey), so the window exchange never sees the
  * full |Q|×|C| candidate stream.
  *
  * Scale path: random-hyperplane LSH bucketing — corpus is hashed into
  * 2^bits sign-pattern buckets; queries probe their own bucket (plus
  * optionally neighboring buckets), turning O(|Q|×|C|) into
  * O(|Q|×|C|/2^bits) expected. Approximate: recall depends on bucket
  * granularity, so it has no equality oracle; ScalaTest checks recall
  * against the exact baseline.
  */
object Similarity {

  /** Round half away from zero — DuckDB/Spark-SQL `round()` semantics
    * (Java's Math.round rounds negative halves UP instead). Computed
    * without an `y + 0.5` intermediate, whose own rounding could cross
    * an integer boundary: `y - floor(y)` is exact for |y| < 2^52. */
  @inline private[operators] def roundHalfAway(y: Double): Long = {
    val f = math.floor(y)
    val r = y - f
    val up = if (y >= 0) r >= 0.5 else r > 0.5
    (if (up) f + 1.0 else f).toLong
  }

  /** Exact top-k of `scored` (query_id, neighbor_id, sim) per query.
    * [[TopK.perKey]] prunes each partition to its local top-k BEFORE the
    * rank window, so the window's exchange moves ≤ partitions × |Q| × k
    * rows instead of every scored candidate — a bare
    * `row_number().over(partitionBy(query_id))` funnels |Q|×|C| rows
    * into |Q| reducers, the classic window bottleneck at scale. The
    * pruning is lossless under the total (sim desc, neighbor_id) order,
    * so ranks are bit-identical to the naive window. */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame =
    TopK.perKey(scored, Seq("query_id"),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))

  /** Maximum-inner-product search (MIPS) via the norm-augmentation
    * reduction (Bachrach et al., RecSys'14; the asymmetric transform
    * behind every "MIPS on a cosine index" deployment — retrieval over
    * unnormalized reward/preference embeddings, where the neighbor with
    * the largest dot product is NOT the nearest-cosine one):
    * corpus x ↦ [x; √(M² − ‖x‖²)] with M the max corpus norm, query
    * q ↦ [q; 0]. Every augmented corpus vector then has norm exactly M,
    * so cosine(q̂, x̂) = ⟨q,x⟩ / (‖q‖·M) — per query a positive affine
    * map of the inner product, making argmax-IP equal argmax-augmented-
    * cosine. The output carries BOTH scores: ranking is by the
    * augmented cosine (what a cosine index would return), `ip` is the
    * raw inner product (what MIPS semantics promise); MipsSpec pins
    * their rank agreement, and the oracle replays both doubles exactly.
    *
    * Scale: same shape as [[bruteForceKnn]] — bounded query side
    * broadcast, corpus scanned in place, per-partition TopK pruning
    * before the rank window. M² is a one-pass scalar aggregate (at
    * 100 TB it's computed once at index-build time alongside the
    * centroids/planes, not per query batch); the augmented column then
    * feeds the SAME LSH/IVF bucketing (s2/s3) unchanged, which is the
    * whole point of the reduction. */
  def mipsKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id"), VF.toDoubleVec(col("embedding")).as("v"))
    // one scalar to the driver (the k-row-collect policy): max squared
    // corpus norm, computed by the same dot fold the oracle replays.
    // m2 - dot(v,v) >= 0 holds exactly (m2 IS one of those dots).
    val m2 = corpus.agg(max(VF.dot(col("v"), col("v")))).head().getDouble(0)
    val aug = corpus.select(col("vec_id"), col("v"),
      concat(col("v"), array(sqrt(lit(m2) - VF.dot(col("v"), col("v")))))
        .as("av"))
    val q = queries.select(col("vec_id").as("query_id"),
        VF.toDoubleVec(col("embedding")).as("qv"))
      .select(col("query_id"), col("qv"),
        concat(col("qv"), array(lit(0.0))).as("aqv"))
    val scored = aug.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VF.dot(col("qv"), col("v")).as("ip"),
        VF.cosine(col("aqv"), col("av")).as("aug_sim"))
    TopK.perKey(scored, Seq("query_id"),
        Seq(col("aug_sim").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("ip"), col("aug_sim"))
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the top-k most-similar corpus vectors whose label DIFFERS from the
    * query's — the negatives that sit closest to the decision boundary,
    * which is what dense-retriever / embedding-model training pairs with
    * each positive (DPR, Karpukhin et al. 2020; "hard" because a random
    * negative is trivially far). Same-label vectors (potential
    * positives) and the query itself are excluded BEFORE scoring.
    * Output: (query_id, query_label, neighbor_id, neighbor_label,
    * rank, sim) — rank over (sim DESC, neighbor_id), total.
    *
    * Scale: identical shape to [[bruteForceKnn]] — bounded query side
    * broadcast, corpus scanned in place (never shuffled), the label
    * filter applied inside the scan stage so the candidate stream
    * shrinks before TopK's per-partition pruning. When the query side
    * is itself corpus-sized, route through the LSH/IVF bucketing
    * (s2/s12 machinery) with the same label predicate on the
    * bucket join. */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id"), col("label").as("neighbor_label"),
      VF.toDoubleVec(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("label").as("query_label"),
      VF.toDoubleVec(col("embedding")).as("qv"))
    val scored = corpus.join(broadcast(q),
        col("vec_id") =!= col("query_id") &&
          col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"),
        col("vec_id").as("neighbor_id"), col("neighbor_label"),
        VF.cosine(col("qv"), col("v")).as("sim"))
    TopK.perKey(scored, Seq("query_id"),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("rank"), col("sim"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank, sim) — double math as a strict
    * left-to-right fold for cross-engine determinism. */
  def bruteForceKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id"), VF.toDoubleVec(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      VF.toDoubleVec(col("embedding")).as("qv"))
    topkPerQuery(
      corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim")),
      k)
  }

  /** Radius (threshold) search: every corpus vector within cosine
    * similarity ≥ `tau` of each query — the "find ALL near neighbors"
    * variant of [[bruteForceKnn]], used when the downstream consumer
    * needs the complete neighborhood (near-dup candidate harvesting,
    * retrieval-augmented filtering) rather than a fixed k.
    * Output: (query_id, neighbor_id, sim), self-pairs excluded.
    *
    * Scale: identical shape to s1 — the bounded query side broadcasts,
    * the corpus scans in place and never shuffles, and the ≥ tau
    * predicate filters inside the scan stage, so the result stream is
    * |matches|, not |Q|×|C|. No window at all (radius search has no
    * rank), which removes even the TopK exchange. The LSH-bucketed
    * variants (s2/s4 machinery) remain the 100 TB path when |Q| is
    * itself corpus-sized. */
  def rangeSearch(emb: DataFrame, queries: DataFrame, tau: Double): DataFrame = {
    val corpus = emb.select(col("vec_id"), VF.toDoubleVec(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      VF.toDoubleVec(col("embedding")).as("qv"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VF.cosine(col("qv"), col("v")).as("sim"))
      .filter(col("sim") >= lit(tau))
  }

  /** k-NN label vote: classify each query vector by the majority label
    * of its k exact cosine neighbors (self excluded), ties broken toward
    * the smallest label — the standard embedding-space eval for "does
    * this representation separate the classes", and the classifier
    * behind quality/domain filtering when labels mark curated subsets.
    * Output: (query_id, true_label, pred_label, n_votes).
    *
    * Scale: the vote is a groupBy on (query_id, label) over |Q|×k rows
    * and the winner a single max(struct) — no window funnel. Label
    * lookups broadcast only if the optimizer deems the corpus small;
    * at 100 TB both joins shuffle on their keys. */
  def knnClassify(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val knn = bruteForceKnn(emb, queries, k)
    val nl = emb.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"))
    val votes = knn.join(nl, "neighbor_id")
      .groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("nv"))
    // lexicographic max over (votes, -label): most votes, then smallest label
    val pred = votes.groupBy(col("query_id"))
      .agg(max(struct(col("nv").as("v"), (-col("nlabel")).as("negl"))).as("m"))
      .select(col("query_id"), (-col("m.negl")).as("pred_label"),
        col("m.v").as("n_votes"))
    pred.join(queries.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), "query_id")
      .select(col("query_id"), col("true_label"), col("pred_label"),
        col("n_votes"))
  }

  /** Maximal-marginal-relevance selection: from each query's `poolK`
    * exact top neighbors, greedily pick `k` that balance relevance to
    * the query against redundancy with what is already picked —
    * score(c) = λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s); the first pick is
    * pure relevance. The diverse-retrieval / eval-set-construction
    * primitive (Carbonell & Goldstein 1998): plain top-k hands back k
    * near-copies of the best hit, MMR spends the budget on coverage.
    * Ties break toward the smaller neighbor id at every step.
    * Output: (query_id, pick, neighbor_id, score) — pick in 1..k,
    * score = rel for pick 1, the MMR score after.
    *
    * Scale: the greedy loop is inherently sequential in k but runs
    * per-query over a poolK-bounded candidate set — a flatMapGroups
    * whose group payload is ≤ poolK vectors; queries parallelize
    * freely, nothing quadratic in the corpus. Every double op (cosine
    * fold, λ-blend) is written in the same fixed order as the SQL
    * oracle's unrolled steps, so selection replays exactly. */
  def mmrSelect(emb: DataFrame, queries: DataFrame, poolK: Int, k: Int,
      lam: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pool = bruteForceKnn(emb, queries, poolK)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val vecs = emb.select(col("vec_id").as("neighbor_id"),
      VF.toDoubleVec(col("embedding")).as("nv"))
    pool.join(vecs, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("nv"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // deterministic candidate order: relevance desc, id asc
        val cands = it.map { case (_, id, rel, v) => (id, rel, v.toArray) }
          .toArray.sortBy { case (id, rel, _) => (-rel, id) }
        // Zero-norm guard: cosine against a zero vector is 0/0 = NaN,
        // which the `score > bestScore` comparison silently never picks
        // while a SQL ORDER BY would sort it first — a latent oracle
        // divergence. Pinning cos to 0.0 on a zero norm product makes
        // the degenerate case deterministic and engine-independent
        // (a zero vector is "orthogonal to everything": no diversity
        // penalty, and its rel score upstream is likewise guarded).
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dab = 0.0; var da = 0.0; var db = 0.0; var i = 0
          while (i < a.length) {
            dab += a(i) * b(i); da += a(i) * a(i); db += b(i) * b(i); i += 1
          }
          val den = math.sqrt(da) * math.sqrt(db)
          if (den == 0.0) 0.0 else dab / den
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
        var pick = 1
        while (pick <= k && remaining.nonEmpty) {
          var bestIdx = 0
          var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < remaining.length) {
            val (id, rel, v) = remaining(i)
            val score =
              if (selected.isEmpty) rel
              else {
                var maxSel = Double.NegativeInfinity
                var j = 0
                while (j < selected.length) {
                  val s = cos(v, selected(j))
                  if (s > maxSel) maxSel = s
                  j += 1
                }
                lam * rel - (1.0 - lam) * maxSel
              }
            if (score > bestScore || (score == bestScore && id < bestId)) {
              bestIdx = i; bestScore = score; bestId = id
            }
            i += 1
          }
          val (id, _, v) = remaining.remove(bestIdx)
          selected += v
          out += ((qid, pick, id, bestScore))
          pick += 1
        }
        out.iterator
      }
      .toDF("query_id", "pick", "neighbor_id", "score")
  }

  /** IVF centroid training: a deterministic sample (lowest `nCells`
    * ids, L2-normalized) optionally refined by `iters` spherical-Lloyd
    * sweeps — assign every vector to its best centroid, recompute each
    * cell's normalized mean. Fully deterministic: no RNG seeds the
    * init, and each cell's mean folds its members in vec_id order (the
    * per-cell sort is bounded by cell size, the same bound as every
    * bucket scan here). Empty cells keep their previous centroid. The
    * nCells-row collect per sweep is the standard IVF training step. */
  def ivfCentroids(emb: DataFrame, nCells: Int,
      iters: Int = 0): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    def normalize(v: Array[Double]): Array[Double] = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      val n = math.sqrt(acc)
      if (n == 0.0) v else v.map(_ / n)
    }
    var centroids: Array[Array[Double]] = emb.orderBy(col("vec_id")).limit(nCells)
      .select(VF.toDoubleVec(col("embedding")).as("v")).collect()
      .map(r => normalize(r.getSeq[Double](0).toArray))
    val vecs = emb.select(col("vec_id").cast("long"),
      VF.toDoubleVec(col("embedding"))).as[(Long, Seq[Double])]
    for (_ <- 0 until iters) {
      val cs = centroids
      val means = vecs
        .map { case (id, vec) =>
          val v = vec.toArray
          var best = 0; var bestSim = Double.MinValue
          var c = 0
          while (c < cs.length) {
            var acc = 0.0; var i = 0
            val cv = cs(c)
            while (i < v.length) { acc += v(i) * cv(i); i += 1 }
            if (acc > bestSim) { bestSim = acc; best = c }
            c += 1
          }
          (best, id, vec)
        }
        .groupByKey(_._1)
        .mapGroups { (cell: Int, it: Iterator[(Int, Long, Seq[Double])]) =>
          val members = it.map { case (_, id, v) => (id, v) }.toArray.sortBy(_._1)
          val sum = new Array[Double](members.head._2.length)
          members.foreach { case (_, v) =>
            var i = 0
            while (i < sum.length) { sum(i) += v(i); i += 1 }
          }
          (cell, sum.map(_ / members.length))
        }
        .collect().toMap
      centroids = centroids.indices.map(c =>
        means.get(c).map(normalize).getOrElse(centroids(c))).toArray
    }
    centroids
  }

  /** IVF (inverted-file) ANN: corpus is partitioned into cells around
    * centroids; queries probe only the nProbe nearest cells and rerank
    * exactly inside them — O(|corpus| × nProbe / nCells) per query.
    *
    * Centroids come from [[ivfCentroids]] (deterministic sample, plus
    * `kmeansIters` optional spherical-Lloyd refinement sweeps). Cell
    * assignment and probing are fused primitive loops. */
  def ivfKnn(emb: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = ivfCentroids(emb, nCells, kmeansIters)
    // centroid sims in a fused loop (the column-HOF form materializes 16
    // arrays per row); ties resolve to the first max, matching the
    // previous array_position(array_max) formulation
    def cSims(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        var acc = 0.0; var i = 0
        val cv = centroids(c)
        while (i < v.length) { acc += v(i) * cv(i); i += 1 }
        out(c) = acc; c += 1
      }
      out
    }

    val corpus = emb.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) =>
        val sims = cSims(vec.toArray)
        var best = 0; var c = 1
        while (c < sims.length) { if (sims(c) > sims(best)) best = c; c += 1 }
        (id, vec, best + 1)
      }
      .toDF("vec_id", "v", "cell")
    // each query probes its nProbe closest cells (desc sim, asc cell)
    val probed = queries.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vec) =>
        val sims = cSims(vec.toArray)
        sims.indices.sortBy(c => (-sims(c), c)).take(nProbe)
          .map(c => (id, vec, c + 1))
      }
      .toDF("query_id", "qv", "cell")

    topkPerQuery(
      corpus.join(broadcast(probed),
          corpus("cell") === probed("cell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim")),
      k)
  }


  /** (vec_id, v, bucket) with the shared deterministic splitmix64
    * sign-hyperplane signature — the one bucket space every LSH
    * operator here (s2/s4/s12 and the embedding-LSH dedup) hashes
    * into, so their candidate sets are interchangeable and the
    * bucketing replays exactly in SQL. Strict ascending-index
    * projection folds, bit j set iff proj_j >= 0. */
  private[operators] def lshSignatures(emb: DataFrame, bits: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val b = bits
    emb.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) =>
        val v = vec.toArray
        var sig = 0L; var j = 0
        while (j < b) {
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i) * Dedup.hyperplaneComponent(i, j); i += 1 }
          if (acc >= 0) sig |= (1L << j)
          j += 1
        }
        (id, vec, sig)
      }
      .toDF("vec_id", "v", "bucket")
  }

  /** LSH-bucketed nearest-neighbor JOIN (s12): top-k right-side
    * neighbors for EVERY left row, where BOTH sides are corpus-sized —
    * the semantic-join shape (align two corpora, pair paraphrases,
    * attach each document's nearest curated exemplar) that the
    * query-batch operators (s1–s6, bounded |Q| broadcast) deliberately
    * don't cover.
    *
    * Both sides hash into [[lshSignatures]]' shared deterministic
    * hyperplane bucket space and meet in a plain shuffle join on the
    * signature: no broadcast, no all-pairs — |L|·|R|/2^bits expected
    * candidates, then exact cosine + [[topkPerQuery]]'s partition-local
    * TopK prune for the rerank. `bits` scales with corpus size (log2 of
    * rows over target bucket occupancy): 8 here at test scale, 16–20
    * at 100 TB — the same dial every LSH operator exposes. Planes are
    * deterministic, so the result replays exactly in SQL (the s2
    * oracle precedent). A left row whose bucket holds no right member
    * yields no output — the documented approximate-recall contract
    * shared with s2; raise recall with wider sketches or the s4
    * multiprobe machinery, precision is exact regardless. */
  def nnJoin(left: DataFrame, right: DataFrame, k: Int, bits: Int): DataFrame = {
    val l = lshSignatures(left, bits)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val r = lshSignatures(right, bits)
    topkPerQuery(
      r.join(l, "bucket")
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim")),
      k)
  }

  /** Multi-probe LSH top-k: queries probe their own sign-hyperplane
    * bucket PLUS the `probes` buckets reached by flipping the
    * lowest-|margin| projection bits — the planes the query sits closest
    * to, i.e. the most likely sign disagreements with a true neighbor
    * (Lv et al., VLDB'07 multi-probe LSH). Lifts recall at the same
    * bucket granularity for `probes`× the probe cost instead of the
    * 2^Δbits cost of coarser buckets.
    *
    * Hyperplanes are the shared deterministic splitmix64 family
    * (Dedup.hyperplaneComponent); signature + margins are computed in one
    * typed pass per vector (fused primitive loops — the column-HOF
    * formulation re-materializes a dim-length array per plane). The
    * probe fan-out is broadcast; the corpus is never shuffled. */
  def multiProbeLshKnn(emb: DataFrame, queries: DataFrame, k: Int,
      bits: Int, probes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(probes >= 0 && probes <= bits, s"probes $probes out of [0, $bits]")

    def projections(v: Array[Double]): Array[Double] = {
      val proj = new Array[Double](bits)
      var j = 0
      while (j < bits) {
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i) * Dedup.hyperplaneComponent(i, j); i += 1 }
        proj(j) = acc
        j += 1
      }
      proj
    }
    def sigOf(proj: Array[Double]): Long = {
      var sig = 0L; var j = 0
      while (j < bits) { if (proj(j) >= 0) sig |= (1L << j); j += 1 }
      sig
    }

    val corpus = lshSignatures(emb, bits)
    val qProbes = queries.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vec) =>
        val proj = projections(vec.toArray)
        val base = sigOf(proj)
        // flip the `probes` planes with the smallest |projection|
        val order = (0 until bits).sortBy(j => math.abs(proj(j)))
        Iterator.single((id, vec, base)) ++
          order.take(probes).iterator.map(j => (id, vec, base ^ (1L << j)))
      }
      .toDF("query_id", "qv", "bucket")
    topkPerQuery(
      corpus.join(broadcast(qProbes),
          corpus("bucket") === qProbes("bucket") &&
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim"))
        .distinct(), // a neighbor can surface via several probes
      k)
  }

  /** Scalar-quantized ANN (the FAISS "SQ8" shape): the corpus is
    * L2-normalized and quantized ONCE to int8 codes + one per-vector
    * scale — a 4× smaller artifact than float32, which is the object a
    * production pipeline persists, caches, and scans (the broadcast /
    * IO ceiling moves 4× with it). Queries score the CODES approximately
    * (scale · Σ q_i·code_i ≈ cosine, since both sides are normalized),
    * each partition prunes to its local top-(rerank·k) per query, and
    * only the surviving rerank·k candidate ids fetch their full-precision
    * vectors for the exact rerank — so full vectors are touched for
    * |Q|·rerank·k rows, not the whole corpus.
    *
    * Output schema and sims match [[bruteForceKnn]] exactly (the rerank
    * recomputes cosine with the shared strict fold); whenever the
    * approximate top-(rerank·k) contains the true top-k — the common
    * case, since int8 on normalized vectors carries ~1/254 per-component
    * error — the result is row-for-row identical to brute force.
    * Approximate by design → recall spec, no equality oracle. */
  def sqKnn(emb: DataFrame, queries: DataFrame, k: Int,
      rerank: Int = 4): DataFrame = {
    require(rerank >= 1, s"rerank $rerank must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    def normalize(v: Array[Double]): Array[Double] = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      val n = math.sqrt(acc)
      if (n == 0.0) v else { val o = new Array[Double](v.length)
        i = 0; while (i < v.length) { o(i) = v(i) / n; i += 1 }; o }
    }
    // the persisted artifact: (vec_id, int8 codes, scale)
    val codes = emb.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) =>
        val v = normalize(vec.toArray)
        var maxAbs = 0.0; var i = 0
        while (i < v.length) {
          val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1
        }
        val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
        val cs = new Array[Byte](v.length)
        i = 0
        while (i < v.length) {
          cs(i) = math.round(v(i) / scale).toByte; i += 1
        }
        (id, cs, scale)
      }
      .toDF("vec_id", "codes", "scale")
    val qNorm = queries.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) => (id, normalize(vec.toArray).toSeq) }
      .collect()
    val bc = spark.sparkContext.broadcast(
      qNorm.map { case (id, v) => (id, v.toArray) })
    // approximate scan over the compact codes; corpus never shuffles
    val approx = codes.as[(Long, Array[Byte], Double)]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (id, cs, scale) =>
          qs.iterator.filter(_._1 != id).map { case (qid, qv) =>
            var dot = 0.0; var i = 0
            while (i < cs.length) { dot += qv(i) * cs(i); i += 1 }
            (qid, id, dot * scale)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val cands = TopK.perKey(approx, Seq("query_id"),
        Seq(col("approx").desc, col("neighbor_id")), rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank: only the candidate ids touch full-precision vectors
    val q = queries.select(col("vec_id").as("query_id"),
      VF.toDoubleVec(col("embedding")).as("qv"))
    val full = emb.select(col("vec_id"), VF.toDoubleVec(col("embedding")).as("v"))
    topkPerQuery(
      full.join(broadcast(cands), full("vec_id") === cands("neighbor_id"))
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim")),
      k)
  }

  /** Shared by the PQ family: L2-normalize. */
  private def l2unit(v: Array[Double]): Array[Double] = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    val n = math.sqrt(acc)
    if (n == 0.0) v else {
      val o = new Array[Double](v.length)
      i = 0; while (i < v.length) { o(i) = v(i) / n; i += 1 }; o
    }
  }

  /** Nearest subspace centroid by L2 within subspace j; first-min
    * tie-break (= the oracle's ORDER BY d, cid). */
  private def pqCodeOf(v: Array[Double], j: Int, sub: Int,
      book: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      var d = 0.0; var i = 0
      val cv = book(c)
      while (i < cv.length) {
        val x = v(j * sub + i) - cv(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic PQ codebook training shared by [[pqKnn]] and
    * [[ivfPqKnn]]: seed = the lowest `nCodes` vec_ids' subvectors (the
    * [[ivfCentroids]] idiom), then `iters` Lloyd sweeps — each sweep is
    * ONE distributed pass assigning all m subspaces and an m×nCodes-row
    * collect, with integer-quantized means (the s7/Clustering idiom:
    * summing round-half-away(x·1024) Longs is order-free where a double
    * fold would depend on partition arrival order, and the power-of-two
    * scale keeps x·1024 exact, identical to SQL round()). Returns the
    * L2-normalized corpus, the subspace width and the trained books. */
  private def pqTrain(emb: DataFrame, m: Int, nCodes: Int, iters: Int)
      : (Dataset[(Long, Seq[Double])], Int, Array[Array[Array[Double]]]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) => (id, l2unit(vec.toArray).toSeq) }
    val dim = vecs.head()._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    var books: Array[Array[Array[Double]]] = {
      val seeds = vecs.filter(_._1 < nCodes).collect().sortBy(_._1).map(_._2.toArray)
      require(seeds.nonEmpty, "no codebook seeds: no vec_id below nCodes")
      Array.tabulate(m)(j =>
        seeds.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)))
    }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(books)
      val means = vecs
        .flatMap { case (id, vec) =>
          val v = vec.toArray
          val bs = bc.value
          (0 until bs.length).iterator.map { j =>
            ((j, pqCodeOf(v, j, sub, bs(j))), (id, vec))
          }
        }
        .groupByKey(_._1)
        .mapGroups { (jc: (Int, Int), it: Iterator[((Int, Int), (Long, Seq[Double]))]) =>
          val (j, c) = jc
          var n = 0L
          val qsum = new Array[Long](sub)
          it.foreach { case (_, (_, vec)) =>
            var i = 0
            while (i < sub) {
              qsum(i) += roundHalfAway(vec(j * sub + i) * 1024.0); i += 1
            }
            n += 1
          }
          (j, c, qsum.map(q => q.toDouble / (n * 1024L).toDouble).toSeq)
        }
        .collect()
      val next = books.map(_.clone())
      means.foreach { case (j, c, mean) => next(j)(c) = mean.toArray }
      books = next
    }
    (vecs, sub, books)
  }

  /** Per-query ADC lookup tables: exact dots of each normalized query
    * subvector with each subspace centroid — m × nCodes doubles per
    * query, built once and broadcast. */
  private def adcTables(queries: DataFrame, m: Int, sub: Int,
      books: Array[Array[Array[Double]]]): Array[(Long, Array[Array[Double]])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) => (id, l2unit(vec.toArray).toSeq) }
      .collect()
      .map { case (qid, qv) =>
        val q = qv.toArray
        val t = Array.tabulate(m, books(0).length) { (j, c) =>
          var acc = 0.0; var i = 0
          val cv = books(j)(c)
          while (i < sub) { acc += q(j * sub + i) * cv(i); i += 1 }
          acc
        }
        (qid, t)
      }
  }

  /** Exact cosine rerank of broadcast (query_id, neighbor_id) candidate
    * pairs — the tail every quantized scan ([[sqKnn]], [[pqKnn]],
    * [[ivfPqKnn]]) shares: only candidate ids touch full-precision
    * vectors. */
  private def rerankExact(emb: DataFrame, queries: DataFrame,
      cands: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      VF.toDoubleVec(col("embedding")).as("qv"))
    val full = emb.select(col("vec_id"), VF.toDoubleVec(col("embedding")).as("v"))
    topkPerQuery(
      full.join(broadcast(cands), full("vec_id") === cands("neighbor_id"))
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          VF.cosine(col("qv"), col("v")).as("sim")),
      k)
  }

  /** Product-quantized ANN (the FAISS "PQ / ADC" shape): vectors are
    * L2-normalized, split into `m` subspaces, and each subvector is
    * replaced by the id of its nearest subspace centroid — `m` BYTES per
    * vector, a 32× smaller scan artifact than float64 (8× smaller than
    * s5's int8 codes), which is what moves the IO/broadcast ceiling at
    * 100 TB. Queries score codes by Asymmetric Distance Computation:
    * one m×`nCodes` lookup table of exact query-subvector · centroid
    * dots per query, then each corpus vector's approximate sim is m
    * table lookups — no float vector is touched during the scan.
    * Candidates prune per partition to rerank·k (TopK.perKey) and only
    * those ids fetch full-precision vectors for the exact rerank, same
    * contract as [[sqKnn]].
    *
    * Codebooks: [[pqTrain]] (deterministic). Approximate by design →
    * recall spec, no equality oracle; with rerank·k covering the corpus
    * the output is row-for-row brute force (spec-pinned). */
  def pqKnn(emb: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, nCodes: Int = 16, rerank: Int = 4,
      kmeansIters: Int = 1): DataFrame = {
    require(m >= 1 && nCodes >= 1 && nCodes <= 256 && rerank >= 1,
      s"bad PQ params (m=$m nCodes=$nCodes rerank=$rerank)")
    val spark = emb.sparkSession
    import spark.implicits._
    val (vecs, sub, books) = pqTrain(emb, m, nCodes, kmeansIters)
    val bcBooks = spark.sparkContext.broadcast(books)
    // the persisted artifact: m bytes per vector
    val codes = vecs.map { case (id, vec) =>
        val v = vec.toArray
        val bs = bcBooks.value
        val cs = new Array[Byte](m)
        var j = 0
        while (j < m) { cs(j) = pqCodeOf(v, j, sub, bs(j)).toByte; j += 1 }
        (id, cs)
      }
      .toDF("vec_id", "codes")
    val bcTables = spark.sparkContext.broadcast(
      adcTables(queries, m, sub, books))
    val approx = codes.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val qs = bcTables.value
        it.flatMap { case (id, cs) =>
          qs.iterator.filter(_._1 != id).map { case (qid, t) =>
            var acc = 0.0; var j = 0
            while (j < m) { acc += t(j)(cs(j) & 0xFF); j += 1 }
            (qid, id, acc)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val cands = TopK.perKey(approx, Seq("query_id"),
        Seq(col("approx").desc, col("neighbor_id")), rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(emb, queries, cands, k)
  }

  /** IVF + PQ composite ANN (the FAISS "IVFPQ" shape — THE 100 TB
    * layout): the corpus is routed into [[ivfCentroids]] cells AND
    * compressed to m-byte PQ codes in the same pass, so a query's scan
    * touches only its nProbe probed cells' CODES — candidate volume
    * drops by nProbe/nCells on top of PQ's 32× byte shrink, which is
    * the difference between scanning 100 TB of floats and ~hundreds of
    * GB of routed codes. Per query: ADC tables score the probed codes
    * (a broadcast hash join of the tiny (query, cell) probe table
    * against the coded corpus — the corpus never shuffles), the top
    * rerank·k survive, and only those fetch full vectors for the exact
    * rerank. Cell assignment/probing reuses s3's exact arithmetic
    * (raw-vector dots against normalized seed centroids, first-max
    * tie-break) and the codes reuse s6's [[pqTrain]], so the whole
    * composite replays exactly in the SQL oracle. */
  def ivfPqKnn(emb: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 8, nCodes: Int = 16,
      rerank: Int = 4, kmeansIters: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells,
      s"bad IVF params (nCells=$nCells nProbe=$nProbe)")
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = ivfCentroids(emb, nCells)
    def bestCells(v: Array[Double], n: Int): Seq[Int] = {
      val sims = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        var acc = 0.0; var i = 0
        val cv = centroids(c)
        while (i < v.length) { acc += v(i) * cv(i); i += 1 }
        sims(c) = acc; c += 1
      }
      sims.indices.sortBy(c => (-sims(c), c)).take(n).map(_ + 1)
    }
    val (_, sub, books) = pqTrain(emb, m, nCodes, kmeansIters)
    val bcBooks = spark.sparkContext.broadcast(books)
    // one corpus pass emits BOTH routing and compression: (cell, codes)
    val coded = emb.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) =>
        val v = vec.toArray
        val u = l2unit(v)
        val bs = bcBooks.value
        val cs = new Array[Byte](m)
        var j = 0
        while (j < m) { cs(j) = pqCodeOf(u, j, sub, bs(j)).toByte; j += 1 }
        (id, bestCells(v, 1).head, cs)
      }
      .toDF("vec_id", "cell", "codes")
    // each query probes its nProbe closest cells (desc sim, asc cell)
    val probed = queries.select(col("vec_id").cast("long"),
        VF.toDoubleVec(col("embedding")))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vec) =>
        bestCells(vec.toArray, nProbe).map(c => (id, c))
      }
      .toDF("query_id", "cell")
    val bcTables = spark.sparkContext.broadcast(
      adcTables(queries, m, sub, books).toMap)
    val approx = coded.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("codes"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        val qs = bcTables.value
        it.map { case (qid, id, cs) =>
          val t = qs(qid)
          var acc = 0.0; var j = 0
          while (j < m) { acc += t(j)(cs(j) & 0xFF); j += 1 }
          (qid, id, acc)
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val cands = TopK.perKey(approx, Seq("query_id"),
        Seq(col("approx").desc, col("neighbor_id")), rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(emb, queries, cands, k)
  }

  /** LSH-bucketed approximate top-k: exact rerank within each signature
    * bucket — the single-probe (probes = 0) case of [[multiProbeLshKnn]],
    * so it shares the deterministic splitmix64 hyperplane family with
    * every other sign-hyperplane operator (interchangeable bucket
    * spaces, and the bucketing is exactly replayable in SQL for the
    * oracle). Output schema matches bruteForceKnn (rank gaps possible
    * when a bucket holds < k candidates). */
  def lshKnn(emb: DataFrame, queries: DataFrame, k: Int, bits: Int): DataFrame =
    multiProbeLshKnn(emb, queries, k, bits, probes = 0)

  /** Hyperplane-LSH parameter sweep (s16): the tuning readout behind
    * every "how many signature bits do I need" decision — for each
    * width, the precision/recall of SINGLE-PROBE bucket candidates
    * against the exact cosine >= tau neighborhood ([[rangeSearch]]) of
    * a bounded query set. One row per width: candidate/truth/hit
    * counts plus integer basis-point precision and recall. Because
    * the hyperplanes are deterministic per plane index j, a width-b
    * signature is the LOW b bits of the widest signature — ONE
    * [[lshSignatures]] pass serves every config (mask, don't rehash).
    *
    * Scale: the signature pass is corpus-sized (zero-shuffle map);
    * candidates join the |Q|-row masked query buckets broadcast-side;
    * the truth scan is s11's broadcast-query corpus scan. At 100 TB
    * the eval runs on a sampled query set exactly as here — |Q| is
    * the dial, never the corpus. */
  def lshParameterSweep(emb: DataFrame, queries: DataFrame, tau: Double,
      bitsList: Seq[Int] = Seq(4, 8, 12)): DataFrame = {
    require(bitsList.nonEmpty && bitsList.forall(b => b >= 1 && b <= 62))
    val sig = lshSignatures(emb, bitsList.max)
      .select(col("vec_id"), col("bucket"))
    val truth = rangeSearch(emb, queries, tau)
      .select(col("query_id"), col("neighbor_id"))
    val qids = queries.select(col("vec_id").cast("long").as("query_id"))
    val qsig = sig.join(qids, sig("vec_id") === qids("query_id"))
      .select(col("query_id"), col("bucket").as("qbucket"))
    val frames = bitsList.map { bits =>
      val mask = (1L << bits) - 1
      val cand = sig
        .join(broadcast(qsig),
          col("bucket").bitwiseAND(mask) === col("qbucket").bitwiseAND(mask) &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val st = cand
        .join(truth.withColumn("t", lit(1L)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(coalesce(col("t"), lit(0L))), lit(0L)).as("n_hit"))
      st.crossJoin(truth.agg(count(lit(1)).as("n_true")))
        .select(lit(bits).as("bits"),
          col("n_candidates"), col("n_true"), col("n_hit"),
          when(col("n_candidates") === 0, lit(0L))
            .otherwise(floor(col("n_hit") * 10000 / col("n_candidates")))
            .cast("long").as("precision_bp"),
          when(col("n_true") === 0, lit(0L))
            .otherwise(floor(col("n_hit") * 10000 / col("n_true")))
            .cast("long").as("recall_bp"))
    }
    frames.reduce(_ unionByName _)
  }
}
