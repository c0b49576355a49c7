package graft.api

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Sampling, Similarity, SkewJoin}

/** Java-typed DataFrame-in/DataFrame-out entry points for the COMPOSITE
  * operator library — the pieces of the engine that are whole-plan
  * shapes rather than scalar expressions, and therefore can't be
  * reached through a registered SQL function the way `splitmix64`,
  * `graft_bloom_might_contain` or the vector expressions are
  * (SqlSurfaceSpec). PySpark callers pass `df._jdf` across py4j and
  * wrap the result back into a DataFrame; `python/graft_logstore.py`
  * hides that plumbing. Every method delegates to the Scala operator
  * unchanged — no logic lives here, so the Python surface inherits the
  * exact plan shapes (salted shuffle, hash-threshold sampling, banded
  * candidate joins, LSH bucket join) the specs and stress curves pin.
  */
object PyOps {

  /** Skew-resistant inner join: [[SkewJoin.saltedInner]] — salt the big
    * side, replicate the dim side `factor` ways, provably
    * result-identical to the plain join. */
  def saltedInner(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, factor: Int): DataFrame =
    SkewJoin.saltedInner(big, dim, bigKey, dimKey, factor)

  /** Deterministic stratified sampling: [[Sampling.stratified]] — RNG-free
    * hash-threshold accept per stratum, rates in basis points, zero
    * shuffles. `ratesBp` maps stratum value -> rate. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      ratesBp: java.util.Map[String, Integer], defaultBp: Int): DataFrame =
    Sampling.stratified(df, col(strataCol), col(idCol),
      ratesBp.asScala.map { case (k, v) => k -> v.intValue() }.toMap,
      defaultBp)

  /** COMPLETE thresholded-Levenshtein pair mining:
    * [[Dedup.editDistancePairs]] over a (doc_id, textCol) frame —
    * length bands + codegen'd L1 counting filter + banded DP. */
  def editDistancePairs(docs: DataFrame, maxDist: Int,
      textCol: String): DataFrame =
    Dedup.editDistancePairs(docs, maxDist, textCol)

  /** Corpus x corpus approximate nearest-neighbor join:
    * [[Similarity.nnJoin]] over (vec_id, embedding) frames — shared
    * deterministic hyperplane LSH buckets, shuffle join on signature,
    * exact cosine + top-k inside each bucket. */
  def nnJoin(left: DataFrame, right: DataFrame, k: Int,
      bits: Int): DataFrame =
    Similarity.nnJoin(left, right, k, bits)

  /** ExactSubstr duplicate-span removal:
    * [[Dedup.duplicateSpanRemoval]] over a (doc_id, text) frame —
    * tokens covered by any >= minDocs-document span of spanTokens
    * words are cut; per doc: token/removed/kept counts + the cleaned
    * text's md5 fingerprint. */
  def spanRemoval(docs: DataFrame, spanTokens: Int,
      minDocs: Int): DataFrame =
    Dedup.duplicateSpanRemoval(docs, spanTokens, minDocs)

  /** URL canonicalization ([[graft.functions.TextFunctions.canonicalUrl]]):
    * adds `outCol` = the crawl-dedup canonical form of `urlCol` —
    * fragment dropped, scheme+host lowercased, default port stripped,
    * tracking params dropped, survivors sorted. Zero-shuffle. */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol,
      graft.functions.TextFunctions.canonicalUrl(col(urlCol)))

  /** Exact distributed global rank
    * ([[graft.operators.GlobalRank.withGlobalRank]]): adds `rankCol` =
    * the 1-based row number under (sortCol asc, tieCol asc) with NO
    * single-partition sort — range-bucketed, per-bucket ranked,
    * prefix-offset joined. `tieCol` must make the order total. */
  def withGlobalRank(df: DataFrame, sortCol: String, tieCol: String,
      rankCol: String): DataFrame =
    graft.operators.GlobalRank.withGlobalRank(df, rankCol,
      Seq(col(sortCol).asc, col(tieCol).asc))
}
