package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Kneser–Ney smoothing identity independently of the DuckDB
  * oracle: interpolated KN is a PROBABILITY — for every context w1,
  * Σ_{w2} P(w2|w1) = 1 exactly. In the scaled-rational form the
  * operator emits (num/den with den = 4·c1·Nb), that is
  * Σ_observed num + Σ_unseen 3·Nfwd(w1)·Nback(w2) = den, summed over
  * every w2 with Nback > 0 (words never seen as a continuation carry
  * zero continuation mass). BigInt arithmetic, no tolerance. */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("KN bigram table normalizes to exactly 1 per context") {
    val out = SparkEntry.queries("t34_kneser_ney")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        BigInt(r.getLong(3)), BigInt(r.getLong(4)), r.getInt(5)))
    assert(out.nonEmpty)
    val nb = BigInt(out.length)
    val nfwd = out.groupBy(_._1).map { case (w1, rs) => w1 -> BigInt(rs.length) }
    val c1 = out.groupBy(_._1).map { case (w1, rs) => w1 -> BigInt(rs.map(_._3).sum) }
    val nback = out.groupBy(_._2).map { case (w2, rs) => w2 -> BigInt(rs.length) }
    // re-derive num/den from the count table the output IS, and check
    // the emitted values agree
    out.foreach { case (w1, w2, c12, num, den, qbits) =>
      val expNum = (BigInt(4) * c12 - 3).max(0) * nb + 3 * nfwd(w1) * nback(w2)
      val expDen = BigInt(4) * c1(w1) * nb
      assert(num === expNum && den === expDen, s"($w1,$w2)")
      assert(qbits === expNum.bitLength - expDen.bitLength, s"qbits ($w1,$w2)")
    }
    // Σ P = 1: observed mass + unseen continuation mass = den, per w1
    val sumNback = nback.values.sum // = nb by construction
    assert(sumNback === nb)
    out.groupBy(_._1).foreach { case (w1, rs) =>
      val obsMass = rs.map(_._4).sum
      val obsBack = rs.map(r => nback(r._2)).sum
      val unseenMass = 3 * nfwd(w1) * (sumNback - obsBack)
      val den = rs.head._5
      assert(obsMass + unseenMass === den, s"context $w1 does not normalize")
    }
  }
}
