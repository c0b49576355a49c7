package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("assignment matches a driver-local reference implementation") {
    val k = 4; val iters = 3
    val got = Clustering.kmeansAssign(emb, k, iters)
      .as[(Long, Long)].collect().toMap
    // independent local replay of the contract: quantize, cosine-assign
    // (ties to smaller cid), integer-sum centroid update
    val vecs = emb.select(col("vec_id").cast("long"),
        transform(col("embedding"), x => round(x.cast("double") * 1024)))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, v) => (id, v.toArray) }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    var cents = vecs.filter(_._1 < k).map(_._2.map(identity))
    var assign = Map.empty[Long, Int]
    for (it <- 1 to iters) {
      assign = vecs.map { case (id, v) =>
        val n = math.sqrt(dot(v, v))
        var best = -1; var bestCos = Double.NegativeInfinity
        cents.indices.foreach { c =>
          val cos = dot(v, cents(c)) / (n * math.sqrt(dot(cents(c), cents(c))))
          if (cos > bestCos) { bestCos = cos; best = c }
        }
        id -> best
      }.toMap
      if (it < iters) cents = cents.indices.map { c =>
        val members = vecs.filter(v => assign(v._1) == c)
        if (members.isEmpty) cents(c)
        else members.map(_._2).reduce((a, b) =>
          a.zip(b).map(p => p._1 + p._2))
      }.toArray
    }
    assert(got.size === vecs.length)
    assert(got.forall { case (id, c) => c === assign(id).toLong }, got.toSeq.sorted.take(5))
  }

  test("deterministic across runs; ids within the seed range") {
    val a = Clustering.kmeansAssign(emb, 8, 2).as[(Long, Long)].collect().toMap
    val b = Clustering.kmeansAssign(emb, 8, 2).as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.forall(c => c >= 0 && c < 8))
  }

  test("an emptied cluster keeps its centroid and can win members back") {
    // seed 1 is a scaled copy of seed 0: cosine ties everywhere, so
    // round 1 assigns EVERYTHING to cid 0 (smaller-cid tie-break) and
    // cluster 1 empties. The update must then keep centroid 1 (the
    // COALESCE(prev) path) — after which centroid 0 has drifted to the
    // sum of all members while centroid 1 still points exactly along
    // the parallel vectors, so round 2 wins them back.
    val rows = Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(2.0f, 0.0f),
      2L -> Array(0.9f, 0.1f), 3L -> Array(-1.0f, 0.05f),
      4L -> Array(-0.9f, -0.1f))
    val df = rows.toDF("vec_id", "embedding")
    val one = Clustering.kmeansAssign(df, k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one.values.forall(_ == 0L), one) // ties all break to cid 0
    val two = Clustering.kmeansAssign(df, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(two(0L) === 1L && two(1L) === 1L, two) // kept centroid re-attracts
  }

  test("farthestPointInit: seed, distinct picks, non-increasing covering radius") {
    val picks = Clustering.farthestPointInit(emb, k = 6)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(picks.length === 6)
    // seed is the smallest vec_id with radius 0
    assert(picks.head._1 === 1 && picks.head._2 === 0L && picks.head._3 === 0L)
    // no center chosen twice
    assert(picks.map(_._2).distinct.length === 6)
    // the k-center covering radius can only shrink as centers are added:
    // each pick's selection-time distance bounds the next pick's
    val radii = picks.drop(1).map(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius grew: $a -> $b")
    }
    // hand-check pick 2 against a driver-local scan: argmax distance
    // to the seed, ties to smallest id
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1024)))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.map(_.toLong).toArray) }
    val seed = vecs.minBy(_._1)._2
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val best = vecs.map { case (id, v) => (d2(v, seed), id) }
      .maxBy { case (d, id) => (d, -id) }
    assert((picks(1)._2, picks(1)._3) === ((best._2, best._1)))
  }

  test("clusterPurity: counts, majority tie-break, exact ratio") {
    val assign = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), // cluster 0: labels 1,1,2,2 -> tie, pick 1
      (4L, 1L), (5L, 1L), (6L, 1L) // cluster 1: labels 3,3,4 -> majority 3
    ).toDF("vec_id", "cluster")
    val labeled = Seq(
      (0L, 1), (1L, 1), (2L, 2), (3L, 2),
      (4L, 3), (5L, 3), (6L, 4)).toDF("vec_id", "label")
    val got = Clustering.clusterPurity(assign, labeled)
      .as[(Long, Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(got === Array(
      (0L, 4L, 1, 2L, 0.5),
      (1L, 3L, 3, 2L, 2.0 / 3.0)))
  }

  test("clusterPurity over kmeansAssign matches a local replay") {
    val asg = Clustering.kmeansAssign(emb, k = 4, iters = 2)
    val got = Clustering.clusterPurity(asg, emb)
      .as[(Long, Long, Int, Long, Double)].collect().sortBy(_._1)
    val pairs = asg.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .as[(Long, Long, Int)].collect()
    val want = pairs.groupBy(_._2).toArray.sortBy(_._1).map { case (cid, members) =>
      val byLabel = members.groupBy(_._3).map { case (l, xs) => (l, xs.length.toLong) }
      val (topL, topN) = byLabel.toSeq.maxBy { case (l, n) => (n, -l) }
      (cid, members.length.toLong, topL, topN, topN.toDouble / members.length)
    }
    assert(got === want)
  }
}
