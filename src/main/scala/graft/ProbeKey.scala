package graft
import org.apache.spark.sql.SparkSession
object ProbeKey {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val b = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val ca = a.queryExecution.analyzed.canonicalized
    val cb = b.queryExecution.analyzed.canonicalized
    println("canon == : " + (ca == cb))
    println("sameResult: " + ca.sameResult(cb))
    println("semanticHash a/b: " + ca.hashCode + " " + cb.hashCode)
    spark.stop()
  }
}
