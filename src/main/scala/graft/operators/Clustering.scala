package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means over an embedding column — the
  * clustering primitive behind SemDeDup-style semantic curation
  * (cluster the corpus, then dedup / diversify WITHIN clusters) and a
  * trainable counterpart to [[Dedup.semanticPairs]]' one-shot seeding.
  *
  * Everything is engine-exact so the full iteration is oracle-checkable
  * against any SQL engine, bit for bit:
  *
  *   - vectors are quantized to integer-valued doubles
  *     (`round(x · scale)` — a power-of-two scale makes the product
  *     itself exact, so only the round is a semantic step);
  *   - assignment maximizes cosine, whose dot/norm folds run in strict
  *     ascending index order (integer dots are EXACT — no accumulated
  *     rounding at all for |Σ| < 2^53); ties break to the smaller
  *     cluster id, matching `ORDER BY cos DESC, cid`;
  *   - a centroid update is the elementwise INTEGER SUM of its members
  *     — cosine is scale-invariant, so dividing by the count is
  *     unnecessary and the update is exact and order-independent (the
  *     one place a mean-of-doubles would have made the result depend on
  *     Spark's aggregation order);
  *   - an emptied cluster keeps its previous centroid.
  *
  * Scale: centroids live on the driver (k rows — the standard k-means
  * topology, same as IVF training in [[Similarity]]); each iteration is
  * one broadcast of k·dim doubles, a map-side assignment pass, and one
  * k-row reduceGroups shuffle for the sums. The corpus is scanned
  * `iters` times and never collected. At 100 TB, train on a sample and
  * run the final assignment pass over the full corpus — the assignment
  * map is embarrassingly parallel.
  */
object Clustering {

  private def dotLoop(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Assign every vector to a cluster after `iters` Lloyd rounds seeded
    * by the vectors with `vec_id < k`. Output: (vec_id, cluster). */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 3,
      scale: Int = 1024): DataFrame = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    // cache the quantized working set: every Lloyd round is a full
    // pass (seed collect, per-round centroid sums, final assignment),
    // and without the cache each pass re-reads the parquet and re-runs
    // the quantize map — the farthestPointInit idiom, one bounded copy
    // per session (the sh.cache() class)
    val vecs = emb.select(col("vec_id").cast("long").as("vec_id"),
        transform(VF.toDoubleVec(col("embedding")),
          x => round(x * scale)).as("v"))
      .as[(Long, Seq[Double])]
      .cache()
    val seeds = vecs.filter(_._1 < k).collect().sortBy(_._1)
    require(seeds.nonEmpty, s"no seed centroids: no vec_id below $k")
    var centroids: Array[(Long, Array[Double])] =
      seeds.map { case (id, v) => (id, v.toArray) }
    var assigned: Dataset[(Long, Seq[Double], Long)] = null
    for (it <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids.map { case (cid, cv) =>
        (cid, cv, math.sqrt(dotLoop(cv, cv)))
      })
      assigned = vecs.map { case (id, v) =>
        val arr = v.toArray
        val n = math.sqrt(dotLoop(arr, arr))
        var best = -1L
        var bestCos = Double.NegativeInfinity
        // ascending cid order + strict > keeps the SMALLEST cid on a
        // tie — the `ORDER BY cos DESC, cid` contract of the oracle
        bc.value.foreach { case (cid, cv, cn) =>
          val cos = dotLoop(arr, cv) / (n * cn)
          if (cos > bestCos) { bestCos = cos; best = cid }
        }
        (id, v, best)
      }
      if (it < iters) {
        val sums = assigned.map(t => (t._3, t._2))
          .groupByKey(_._1)
          .reduceGroups((a, b) =>
            (a._1, a._2.zip(b._2).map(p => p._1 + p._2)))
          .map(_._2)
          .collect().toMap
        centroids = centroids.map { case (cid, prev) =>
          (cid, sums.get(cid).map(_.toArray).getOrElse(prev))
        }
      }
    }
    assigned.map(t => (t._1, t._3)).toDF("vec_id", "cluster")
  }

  @inline private def dist2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic farthest-point seeding (Gonzalez's k-center greedy —
    * the classic 2-approximation, and the deterministic stand-in for
    * k-means++ when reproducibility matters more than randomization):
    * seed with the smallest vec_id, then k-1 times pick the point
    * FARTHEST from the chosen set (ties to the smallest vec_id).
    * Returns one row per chosen center: (step, vec_id, radius) where
    * radius is the center's distance² to the previously-chosen set at
    * selection time — step r's radius is exactly the k-center covering
    * radius after r-1 centers, so the output doubles as the
    * diminishing-returns curve used to pick k.
    *
    * Distances are squared Euclidean over integer-quantized components
    * (`round(x·scale)`) — EXACT Long arithmetic, so selection replays
    * bit-for-bit in SQL (`ORDER BY md DESC, vec_id LIMIT 1` per
    * round).
    *
    * Scale: k passes over the corpus, each a broadcast of one dim-long
    * vector + a map + a driver-side 1-row reduce. The min-distance
    * dataset is eagerly localCheckpoint()ed each round and the
    * previous round's copy (and its center broadcast) released once
    * the new one is materialized — without the checkpoint, round r's
    * reduce would re-execute every prior round's dist2 map over the
    * cached vectors and the pass would cost O(n·k²·dim) instead of
    * O(n·k·dim). localCheckpoint, not persist: persist keeps the full
    * lineage (and with it every prior round's broadcast) inside task
    * closures, so the broadcasts could never be destroy()ed; the
    * checkpoint truncates lineage, bounding live broadcasts to one.
    * Each round is two cached passes (the eager checkpoint + the
    * reduce); the corpus is never collected. */
  def farthestPointInit(emb: DataFrame, k: Int = 6,
      scale: Int = 1024): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long").as("vec_id"),
        transform(VF.toDoubleVec(col("embedding")),
          x => round(x * scale)).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v.map(_.toLong).toArray) }
      .cache()
    try {
      val seed = vecs.reduce((a, b) => if (a._1 <= b._1) a else b)
      var picked = List((1, seed._1, 0L))
      val seedBc = spark.sparkContext.broadcast(seed._2)
      // eager localCheckpoint: materialized now, lineage truncated, so
      // the broadcast it captured can be destroyed next round
      var cur: Dataset[(Long, Array[Long], Long)] =
        vecs.map { case (id, v) => (id, v, dist2(v, seedBc.value)) }
          .localCheckpoint()
      var prevBc: org.apache.spark.broadcast.Broadcast[Array[Long]] = seedBc
      for (r <- 2 to k) {
        val next = cur.reduce((a, b) =>
          if (a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)) a else b)
        picked ::= ((r, next._1, next._3))
        val bc = spark.sparkContext.broadcast(next._2)
        val prev = cur
        cur = prev.map { case (id, v, md) =>
          (id, v, math.min(md, dist2(v, bc.value)))
        }.localCheckpoint()
        prev.unpersist()
        prevBc.destroy()
        prevBc = bc
      }
      cur.unpersist()
      prevBc.destroy()
      picked.reverse.toDF("step", "vec_id", "radius")
    } finally vecs.unpersist()
  }

  /** Cluster purity against a ground-truth label column: per cluster,
    * the member count, the majority label (ties toward the smallest
    * label), its count, and purity = n_top / n_members — the SemDeDup /
    * curation-eval readout for "did clustering recover the domains".
    * Output: (cluster, n_members, top_label, n_top, purity).
    *
    * Scale: one shuffle on (cluster, label) with map-side combine, then
    * a k-row aggregate; purity is an exact small-int division, portable
    * across engines. */
  def clusterPurity(assign: DataFrame, labeled: DataFrame): DataFrame = {
    val cl = assign.join(labeled.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"))
    cl.groupBy(col("cluster"))
      .agg(sum(col("n")).as("n_members"),
        max(struct(col("n").as("v"), (-col("label")).as("negl"))).as("m"))
      .select(col("cluster"), col("n_members"),
        (-col("m.negl")).as("top_label"), col("m.v").as("n_top"),
        (col("m.v").cast("double") / col("n_members")).as("purity"))
  }
}
