package graft.queries

/** Shared DuckDB oracle-SQL fragments for exact 64-bit replay of the
  * engine's hash primitives.
  *
  * 64-bit wrap-around arithmetic runs in HUGEINT with values in
  * [0, 2^64): multiplies split the left operand at 2^32 so no
  * intermediate exceeds ~2^97; xors split both operands into 32-bit
  * halves for BIGINT xor(); rotates/shifts are division/multiplication
  * by powers of two. Proven green by the s2/s4 splitmix oracle and the
  * d11 Bloom oracle.
  */
private[queries] object OracleSql {

  def u64mul(x: String, c: BigInt): String =
    s"(((($x) // 4294967296) * $c % 4294967296) * 4294967296 + (($x) % 4294967296) * $c) % 18446744073709551616"
  def u64xor(a: String, b: String): String =
    s"(CAST(xor(CAST(($a) // 4294967296 AS BIGINT), CAST(($b) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296 + CAST(xor(CAST(($a) % 4294967296 AS BIGINT), CAST(($b) % 4294967296 AS BIGINT)) AS HUGEINT))"
  def u64shr(x: String, s: Int): String =
    s"(($x) // ${BigInt(1) << s})"
  def u64rotl(x: String, s: Int): String =
    s"((($x) % ${BigInt(1) << (64 - s)}) * ${BigInt(1) << s} + (($x) // ${BigInt(1) << (64 - s)}))"
  def u64signed(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808 THEN ($x) - 18446744073709551616 ELSE ($x) END AS BIGINT)"

  // XXH64 primes + the golden-gamma / murmur-fmix constants, as unsigned
  private val P1 = BigInt("11400714785074694791") // 0x9E3779B185EBCA87
  private val P2 = BigInt("14029467366897019727") // 0xC2B2AE3D27D4EB4F
  private val P3 = BigInt("1609587929392839161")  // 0x165667B19E3779F9
  private val P4 = BigInt("9650029242287828579")  // 0x85EBCA77C2B2AE63
  private val Golden = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
  private val Fmix1 = BigInt("18397679294719823053") // 0xFF51AFD7ED558CCD
  private val Fmix2 = BigInt("14181476777654086739") // 0xC4CEB9FE1A85EC53

  /** Layered projections computing Spark's builtin `xxhash64` (seed 42)
    * of an unsigned 64-bit column `fpu` → `h1u`; when `withFmix`, also
    * the murmur-fmix64-derived second hash `h2u` (the Bloom
    * Kirsch–Mitzenmacher pair). `inner` must SELECT `fpu` plus any
    * passthrough columns. One projection LAYER per step: every helper
    * argument is a plain column reference, never a prior expression —
    * lateral aliases substitute by copy, and 17 chained copies of 3-5
    * references each would blow the expression tree up exponentially
    * (minutes to plan/run; this shape is instant). */
  def xxHashLongLayers(inner: String, withFmix: Boolean = false): String = {
    val xxSteps = Seq(
      s"${u64mul("fpu", P2)} AS s1",
      s"${u64rotl("s1", 31)} AS s2",
      s"${u64mul("s2", P1)} AS s3",
      s"${u64xor("2870177450012600311", "s3")} AS s4", // seed 42 + P5 + 8
      s"${u64rotl("s4", 27)} AS s5",
      s"(${u64mul("s5", P1)} + $P4) % 18446744073709551616 AS s6",
      s"${u64xor("s6", u64shr("s6", 33))} AS s7",
      s"${u64mul("s7", P2)} AS s8",
      s"${u64xor("s8", u64shr("s8", 29))} AS s9",
      s"${u64mul("s9", P3)} AS s10",
      s"${u64xor("s10", u64shr("s10", 32))} AS h1u")
    val fmixSteps = Seq(
      s"${u64xor("h1u", Golden.toString)} AS g1",
      s"${u64xor("g1", u64shr("g1", 33))} AS g2",
      s"${u64mul("g2", Fmix1)} AS g3",
      s"${u64xor("g3", u64shr("g3", 33))} AS g4",
      s"${u64mul("g4", Fmix2)} AS g5",
      s"${u64xor("g5", u64shr("g5", 33))} AS h2u")
    (xxSteps ++ (if (withFmix) fmixSteps else Nil))
      .foldLeft(inner) { (in, step) => s"SELECT *, $step FROM ($in)" }
  }

  /** Layered projections computing the splitmix64 finalizer (CmsOps.mix)
    * of an unsigned 64-bit column `mxin` → `mxout`. */
  def splitmixLayers(inner: String): String =
    Seq(
      s"((mxin) + $Golden) % 18446744073709551616 AS a1",
      s"${u64mul(u64xor("a1", u64shr("a1", 30)), BigInt("13787848793156543929"))} AS a2", // 0xBF58476D1CE4E5B9
      s"${u64mul(u64xor("a2", u64shr("a2", 27)), BigInt("10723151780598845931"))} AS a3", // 0x94D049BB133111EB
      s"${u64xor("a3", u64shr("a3", 31))} AS mxout")
      .foldLeft(inner) { (in, step) => s"SELECT *, $step FROM ($in)" }

  /** Recursive-CTE FNV-1a 64 of a string column: `WITH RECURSIVE` body
    * fragment. Expects to be spliced as the CTEs `b`/`fnv` reading
    * `(keyCols, <strExpr> AS s)` rows from `fromSql`; yields CTE `fp`
    * with (keyCols, fpu). */
  def fnv64Ctes(keyCols: Seq[String], strExpr: String, fromSql: String): String = {
    val ks = keyCols.mkString(", ")
    val fnvByte = "CAST(('0x' || substring(hx, 2*i+1, 2))::INTEGER AS BIGINT)"
    val fnvX = s"((h // 4294967296) * 4294967296 + CAST(xor(CAST(h % 4294967296 AS BIGINT), $fnvByte) AS HUGEINT))"
    s"""b AS (SELECT $ks, hex(encode($strExpr)) AS hx,
       |  octet_length(encode($strExpr)) AS n FROM $fromSql),
       |fnv AS (
       |  SELECT $ks, CAST(14695981039346656037 AS HUGEINT) AS h, 0 AS i, hx, n FROM b
       |  UNION ALL
       |  SELECT $ks, ${u64mul(fnvX, BigInt("1099511628211"))}, i + 1, hx, n
       |  FROM fnv WHERE i < n),
       |fp AS MATERIALIZED (SELECT $ks, h AS fpu FROM fnv WHERE i = n)""".stripMargin
  }
}
