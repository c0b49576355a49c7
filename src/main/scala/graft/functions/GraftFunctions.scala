package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** One-call SQL registration for every custom function the engine adds,
  * so `spark.sql` users get the same surface as the Column API:
  * rolling_hash, hll_build/hll_merge/hll_estimate,
  * kll_build/kll_merge/kll_quantile, plus the text-pipeline builders
  * (lang_guess, redact_pii, pii_count, text_fingerprint) lowered from
  * their Column form via the Bridge. */
object GraftFunctions {

  /** Register a Column combinator as a SQL function: wrap the call-site
    * expressions as Columns, apply the builder, unwrap the result. */
  private def columnFn(reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      name: String, arity: Int)(build: Seq[org.apache.spark.sql.Column]
        => org.apache.spark.sql.Column): Unit =
    reg.createOrReplaceTempFunction(name, { exprs =>
      require(exprs.length == arity, s"$name expects $arity argument(s)")
      org.apache.spark.sql.graft.Bridge.toExpression(
        build(exprs.map(org.apache.spark.sql.graft.Bridge.column)))
    }, "built-in")

  private def lit(e: Expression, what: String): Number = e match {
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toJavaBigDecimal
    case Literal(v: Number, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    RollingHash.register(spark)
    reg.createOrReplaceTempFunction("hll_build",
      exprs => HllSketchBuild(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hll_merge",
      exprs => HllSketchMerge(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hll_estimate",
      exprs => HllEstimate(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("kll_build",
      exprs => exprs match {
        case Seq(c) => KllSketchBuild(c)
        case Seq(c, k) => KllSketchBuild(c, lit(k, "kll_build k").intValue())
        case _ => throw new IllegalArgumentException("kll_build(col[, k])")
      }, "built-in")
    reg.createOrReplaceTempFunction("kll_merge",
      exprs => KllSketchMerge(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("kll_quantile",
      exprs => KllQuantile(exprs.head,
        lit(exprs(1), "kll_quantile q").doubleValue()), "built-in")
    // SQL surface takes raw text (tokenization inside), matching t3
    columnFn(reg, "lang_guess", 1)(cs => TextFunctions.langGuess(
      TextFunctions.tokens(org.apache.spark.sql.functions.lower(cs.head))))
    columnFn(reg, "redact_pii", 1)(cs => TextFunctions.redactPii(cs.head))
    columnFn(reg, "pii_count", 1)(cs => TextFunctions.piiCount(cs.head))
    columnFn(reg, "text_fingerprint", 1)(cs => TextFunctions.fingerprint(cs.head))
  }
}
