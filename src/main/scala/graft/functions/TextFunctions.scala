package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column builders for the documents pipeline.
  *
  * All built from codegen'd `org.apache.spark.sql.functions` so they stay
  * inside whole-stage codegen; each has a lockstep DuckDB formulation used
  * by the oracle SQL (see queries/TextQueries.scala).
  */
object TextFunctions {

  /** Whitespace tokenization (matches DuckDB
    * regexp_split_to_array(trim(x), '\s+')). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Canonical form: lowercase, collapsed whitespace. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint of the canonical form (cross-engine stable). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Distinct word-level n-gram shingles of a token array.
    * i-th shingle = toks[i..i+n-1] joined by a single space. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + (k + 1))): _*)))

  /** PII patterns shared by redaction and counting — kept inside the
    * syntax subset Java regex and RE2 agree on, so the DuckDB oracle
    * evaluates them identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Scrub emails then IPv4 literals to typed placeholder tokens — the
    * standard pre-release redaction pass of a training-data pipeline.
    * Pure codegen'd regexp_replace; order matters (an email must not
    * first lose its dotted host to the IP pass). */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  /** How many PII spans [[redactPii]] would replace. */
  def piiCount(c: Column): Column =
    (size(regexp_extract_all(c, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0)))).cast(LongType)

  /** Query parameters a crawl pipeline treats as tracking noise: two
    * URLs differing only in these are the same resource. */
  val TrackingParamPrefixes: Seq[String] = Seq("utm_", "fbclid", "gclid")

  /** Canonicalize an absolute http(s) URL with a path component — the
    * crawl-dedup normalizer (every large-scale pipeline's URL-level
    * dedup key): drop the fragment, lowercase scheme and host, strip
    * the scheme's default port (:80 / :443), drop tracking query
    * params ([[TrackingParamPrefixes]]) and SORT the survivors so
    * param order stops mattering. Pure codegen'd string/array
    * functions, zero-shuffle per row; every step replays verbatim in
    * the SQL oracle (split_part / list_filter / list_sort). Inputs
    * without "://" or a path are out of contract (crawl frontiers
    * normalize those upstream). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // query = everything after the FIRST '?' (RFC 3986: '?' is a legal
    // character INSIDE the query, so a second '?' stays in the query
    // string). substring_index(..., -1) would split on the LAST '?' —
    // a two-'?' URL canonicalized differently from the oracle; pinned
    // by the t38 fixture's utm_source=t?w alias and the unit spec.
    val query = when(noFrag.contains("?"),
        noFrag.substr(length(base) + 2, lit(1 << 20)))
      .otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = substring_index(base, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val path = rest.substr(length(hostport) + 1, lit(1 << 20))
    val host = when(scheme === "https",
        regexp_replace(lower(hostport), ":443$", ""))
      .when(scheme === "http", regexp_replace(lower(hostport), ":80$", ""))
      .otherwise(lower(hostport))
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && TrackingParamPrefixes
        .map(pre => !p.startsWith(pre)).reduce(_ && _)))
    concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Count of tokens contained in a marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))

  /** Stopword-marker language guess (n-gram/stopword heuristic).
    * Deterministic argmax with fixed precedence en>de>es>fr>zh; 'und'
    * (undetermined) when no marker hits. Mirrored verbatim in the oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  def langGuess(toks: Column): Column = {
    // single-pass argmax. Spark has no let-binding in expression space
    // and repeats a subexpression wherever it appears, so the token
    // array and the 5-count array are each bound ONCE as the lambda
    // variable of a single-element transform(...); the old when-chain
    // re-evaluated up to 25 marker scans (each dragging its own copy of
    // the tokenizing split) per row. The winner is the FIRST index
    // holding the max — array_position's first-match semantics give the
    // fixed declared-order tie precedence for free.
    val langsArr = array(langMarkers.map { case (lang, _) => lit(lang) }: _*)
    element_at(transform(array(toks), { ts =>
      val counts = array(langMarkers.map { case (_, ws) => markerCount(ts, ws) }: _*)
      element_at(transform(array(counts), c =>
        when(array_max(c) > 0,
          element_at(langsArr, array_position(c, array_max(c)).cast(IntegerType)))
          .otherwise(lit("und"))), 1)
    }), 1)
  }
}
