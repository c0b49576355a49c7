package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic, reproducible sampling for corpus curation — the
  * source-mixing step every LLM data pipeline runs (down-sample the
  * crawl, keep curated sources dense) expressed so the SAME sample
  * falls out of every run, every engine, every re-partitioning.
  *
  * The keep/drop decision is a pure function of the row's stable id:
  * `xxhash64(id) mod 10000 < rate_bp`. No RNG state, no
  * `df.sample()` (whose Bernoulli draw depends on partition layout and
  * seed plumbing), no ordering sensitivity — so samples are stable
  * across retries and incremental runs, compose with dedup/splits, and
  * replay bit-for-bit in the SQL oracle. Nested samples are monotone:
  * lowering a stratum's rate yields a strict subset of the old sample
  * (the hash bucket of a row never changes), which is exactly the
  * property you want when shrinking a mixture without churning the
  * kept set.
  *
  * Scale: the rate table is strata-sized (a broadcast dim); the fact
  * stream maps and filters in place — zero shuffles, fully
  * codegen'd. Horvitz–Thompson `weight` (= 1/rate) rides along so
  * downstream aggregates can stay unbiased. */
object Sampling {

  /** Per-stratum hash-threshold sample. `ratesBp` maps stratum value →
    * keep rate in basis points of 10^4 (e.g. 2500 keeps 25%); strata
    * absent from the map use `defaultBp`. Rows keep their columns plus
    * `weight` = 10^4 / rate_bp. */
  def stratified(df: DataFrame, strataCol: Column, idCol: Column,
                 ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    require(defaultBp >= 0 && defaultBp <= 10000 &&
      ratesBp.values.forall(bp => bp >= 0 && bp <= 10000),
      "sample rates are basis points in [0, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic dim: sorted entry order so the broadcast build side
    // is identical across runs/partitionings
    val rates = ratesBp.toSeq.sortBy(_._1).toDF("__stratum", "__rate_bp")
    df.join(broadcast(rates), strataCol === col("__stratum"), "left")
      .withColumn("__bp", coalesce(col("__rate_bp"), lit(defaultBp)))
      .filter(pmod(xxhash64(idCol), lit(10000)) < col("__bp"))
      .withColumn("weight", lit(10000.0) / col("__bp").cast(DoubleType))
      .drop("__stratum", "__rate_bp", "__bp")
  }
}
