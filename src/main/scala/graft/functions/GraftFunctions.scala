package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** One-call SQL registration for every custom function the engine adds,
  * so `spark.sql` users get the same surface as the Column API:
  * rolling_hash, hll_build/hll_merge/hll_estimate,
  * kll_build/kll_merge/kll_quantile, cms_build/cms_merge/cms_query,
  * bloom_build/bloom_merge/bloom_might_contain, plus the text-pipeline
  * builders (lang_guess, redact_pii, pii_count, text_fingerprint)
  * lowered from their Column form via the Bridge. */
object GraftFunctions {

  /** Register a Column combinator as a SQL function: wrap the call-site
    * expressions as Columns, apply the builder, unwrap the result. */

  private def lit(e: Expression, what: String): Number = e match {
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toJavaBigDecimal
    case Literal(v: Number, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def asColumnFn(name: String, arity: Int)(
      build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.length == arity, s"$name expects $arity argument(s)")
    org.apache.spark.sql.graft.Bridge.toExpression(
      build(exprs.map(org.apache.spark.sql.graft.Bridge.column)))
  }

  /** Every SQL function the engine adds, as (name, builder) — shared by
    * the per-session [[registerAll]] and the cluster-install
    * [[graft.GraftExtensions]] path. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> ((exprs: Seq[Expression]) => RollingHash(exprs.head)),
    "dot_product" -> ((exprs: Seq[Expression]) => exprs match {
      case Seq(a, b) => DotProduct(a, b)
      case _ => throw new IllegalArgumentException("dot_product(a, b)")
    }),
    "cosine_sim" -> asColumnFn("cosine_sim", 2)(cs =>
      VectorFunctions.cosine(cs.head, cs(1))),
    "splitmix64" -> ((exprs: Seq[Expression]) => exprs match {
      case Seq(h) => SplitMix64Expr(h,
        org.apache.spark.sql.catalyst.expressions.Literal(0L))
      case Seq(h, off) => SplitMix64Expr(h, off)
      case _ => throw new IllegalArgumentException("splitmix64(h[, offset])")
    }),
    "hll_build" -> ((exprs: Seq[Expression]) => HllSketchBuild(exprs.head)),
    "hll_merge" -> ((exprs: Seq[Expression]) => HllSketchMerge(exprs.head)),
    "hll_estimate" -> ((exprs: Seq[Expression]) => HllEstimate(exprs.head)),
    "kll_build" -> ((exprs: Seq[Expression]) => exprs match {
      case Seq(c) => KllSketchBuild(c)
      case Seq(c, k) => KllSketchBuild(c, lit(k, "kll_build k").intValue())
      case _ => throw new IllegalArgumentException("kll_build(col[, k])")
    }),
    "kll_merge" -> ((exprs: Seq[Expression]) => KllSketchMerge(exprs.head)),
    "bloom_build" -> ((exprs: Seq[Expression]) => {
      val (n, fpp) = exprs match {
        case Seq(_, n) => (lit(n, "bloom_build expectedItems").longValue(), 0.01)
        case Seq(_, n, f) => (lit(n, "bloom_build expectedItems").longValue(),
          lit(f, "bloom_build fpp").doubleValue())
        case _ => throw new IllegalArgumentException(
          "bloom_build(col, expectedItems[, fpp])")
      }
      val m = BloomOps.optimalNumBits(n, fpp)
      BloomBuild(exprs.head, m, BloomOps.optimalNumHashes(n, m))
    }),
    "bloom_merge" -> ((exprs: Seq[Expression]) => BloomMerge(exprs.head)),
    "bloom_might_contain" -> asColumnFn("bloom_might_contain", 2)(cs =>
      Bloom.bloom_might_contain(cs.head, cs(1))),
    "kll_quantile" -> ((exprs: Seq[Expression]) => KllQuantile(exprs.head,
      lit(exprs(1), "kll_quantile q").doubleValue())),
    "cms_build" -> ((exprs: Seq[Expression]) => CmsSketchBuild(exprs.head)),
    "cms_merge" -> ((exprs: Seq[Expression]) => CmsSketchMerge(exprs.head)),
    "cms_query" -> ((exprs: Seq[Expression]) => CmsQuery(exprs.head, exprs(1))),
    "kmv_build" -> ((exprs: Seq[Expression]) => exprs match {
      case Seq(c) => KmvSketchBuild(c)
      case Seq(c, k) => KmvSketchBuild(c, lit(k, "kmv_build k").intValue())
      case _ => throw new IllegalArgumentException("kmv_build(col[, k])")
    }),
    "kmv_merge" -> ((exprs: Seq[Expression]) => KmvSketchMerge(exprs.head)),
    "kmv_estimate" -> ((exprs: Seq[Expression]) => KmvEstimate(exprs.head)),
    "kmv_jaccard" -> ((exprs: Seq[Expression]) => KmvJaccard(exprs.head, exprs(1))),
    "kmv_union_estimate" -> ((exprs: Seq[Expression]) =>
      KmvUnionEstimate(exprs.head, exprs(1))),
    "kmv_intersect_estimate" -> ((exprs: Seq[Expression]) =>
      KmvIntersectEstimate(exprs.head, exprs(1))),
    // SQL surface takes raw text (tokenization inside), matching t3
    "lang_guess" -> asColumnFn("lang_guess", 1)(cs => TextFunctions.langGuess(
      TextFunctions.tokens(org.apache.spark.sql.functions.lower(cs.head)))),
    "redact_pii" -> asColumnFn("redact_pii", 1)(cs =>
      TextFunctions.redactPii(cs.head)),
    "pii_count" -> asColumnFn("pii_count", 1)(cs =>
      TextFunctions.piiCount(cs.head)),
    "text_fingerprint" -> asColumnFn("text_fingerprint", 1)(cs =>
      TextFunctions.fingerprint(cs.head)))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
