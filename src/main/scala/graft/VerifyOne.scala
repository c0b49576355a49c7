package graft

import org.apache.spark.sql.SparkSession

/** Focused single-query Verify for iterating on a new oracle row:
  * `runMain graft.VerifyOne <sfDir> <outDir> <query...>` dumps just the
  * named queries' parquet + their oracle_sql.json subset. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = MainSessions(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    MainSessions.assertGuarded(spark)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val sqls = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\":" + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
