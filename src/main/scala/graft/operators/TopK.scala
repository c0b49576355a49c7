package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k per key.
  *
  * A bare `row_number().over(Window.partitionBy(key))` shuffles EVERY
  * row to one reducer per key — with low-cardinality keys (q7: 3 return
  * flags) that is all of the data onto 3 tasks, the classic window
  * bottleneck at scale. This operator prunes first:
  *
  *  1. `sortWithinPartitions(order)` — a LOCAL sort, no shuffle (the
  *     same work the window's sort phase would do anyway, but spread
  *     over all input partitions);
  *  2. one streaming pass per partition keeps only the first k rows of
  *     each key (the partition's exact top-k, since rows arrive in
  *     total order);
  *  3. the exact global window runs over ≤ partitions × keys × k rows.
  *
  * The pruning is lossless: any row in the global top-k of its key is
  * in the top-k of whatever partition it sits in. Ordering must be
  * total (include tiebreak columns) for deterministic output.
  */
object TopK {

  /** Rows ranked 1..k per key by `order`, with a `rank` column appended.
    * @param keyCols key column names (low-to-mid cardinality)
    * @param order   total ordering, e.g. Seq(col("p").desc, col("id"))
    * @param k       rows kept per key */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldNames.indexOf(_))
    require(keyIdx.forall(_ >= 0), s"missing key column in ${schema.fieldNames.toSeq}")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    val pruned = df.sortWithinPartitions(order: _*)
      .mapPartitions { it =>
        val seen = scala.collection.mutable.Map[Seq[Any], Int]()
        it.filter { row =>
          val key = keyIdx.map(i => row.get(i))
          val n = seen.getOrElse(key, 0)
          if (n < k) { seen(key) = n + 1; true } else false
        }
      }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    pruned.toDF(schema.fieldNames.toIndexedSeq: _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
