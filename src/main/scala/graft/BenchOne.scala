package graft

import org.apache.spark.sql.SparkSession

/** Focused micro-bench for iterating on individual catalog queries:
  * `runMain graft.BenchOne <sfDir> <reps> <query...>` times each named
  * query `reps` times through the noop sink and prints per-rep seconds
  * (first rep includes planning/JIT warm-up; compare the later reps).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = MainSessions(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    MainSessions.assertGuarded(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
