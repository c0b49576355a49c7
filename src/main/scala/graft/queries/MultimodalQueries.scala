package graft.queries

import graft.Tables._
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries. Real multimodal test assets don't exist
  * in the fixture set, so the oracle-checked query treats document text
  * bytes as opaque binary payloads — every binary-column operator on the
  * checked path (octet length, content digest, fixed-size chunk count,
  * chunk reassembly) behaves identically on real media bytes. The codec
  * stubs are covered by MultimodalSpec. */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map("m1_binary_assets" -> m1)

  /** Binary asset stats + round-trip through fixed-size chunking: chunk
    * count must match octet math and reassembled digests must equal the
    * original (any payload corruption in the shuffle breaks the hash). */
  private def m1: Q = (spark, dir) => {
    val assets = t(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"))
    val chunked = Multimodal.chunk(assets, 256)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(expr("octet_length(chunk)")).as("n_bytes_chunked"))
    assets
      .select(col("asset_id"),
        expr("octet_length(payload)").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .join(chunked, "asset_id")
  }

  def oracles: Map[String, String] = Map(
    "m1_binary_assets" ->
      """SELECT doc_id AS asset_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS digest,
        | CAST((octet_length(encode(text)) - 1) // 256 + 1 AS BIGINT) AS n_chunks,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_chunked
        |FROM documents""".stripMargin
  )
}
