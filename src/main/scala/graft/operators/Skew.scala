package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SCALE.md): salt the fact side
  * deterministically, explode the dimension side `salts` ways, and join
  * on (key, salt) — a hot key's rows spread over `salts` tasks instead
  * of one straggler. Result is identical to the plain inner join
  * (verified by spec); AQE's runtime skew-join split handles the cases
  * you didn't predict, salting handles the ones you did. */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic salt from the full fact row (no RNG state on executors)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
