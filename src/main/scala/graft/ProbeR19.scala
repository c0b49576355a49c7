package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup
import graft.functions.{TextFunctions => TF}

/** Round-19 optimization probe: `runMain graft.ProbeR19 <sfDir> <reps>
  * <variant...>`. Each variant is timed through the noop sink in THIS
  * JVM; run one variant per JVM for clean comparisons. `xcheck-...`
  * variants instead hash-compare a rewrite's rows against the current
  * implementation and print OK/MISMATCH. */
object ProbeR19 {
  private def pairLoop(ids: Array[Long]): Iterator[(Long, Long)] = {
    java.util.Arrays.sort(ids)
    for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.length).iterator
    } yield (ids(i), ids(j))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val variants = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = MainSessions(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    MainSessions.assertGuarded(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    /** order-insensitive content hash over all columns */
    def contentHash(df: DataFrame): (String, Long) = {
      val h = df.select(xxhash64(df.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(sum(col("h")), count(lit(1))).collect()(0)
      (String.valueOf(h.get(0)), h.getLong(1))
    }

    def xcheck(name: String, cur: DataFrame, alt: DataFrame): Unit = {
      val (h1, n1) = contentHash(cur)
      val (h2, n2) = contentHash(alt)
      println(s"[probe] xcheck $name: " +
        (if (h1 == h2 && n1 == n2) s"OK (n=$n1)"
         else s"MISMATCH cur=($h1,$n1) alt=($h2,$n2)"))
    }

    // ---- rewrites under test ----

    def containmentPostings(): DataFrame = {
      val sh = Dedup.docShingleHashes(docs).cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh
        .groupByKey(r => r.getLong(1))(org.apache.spark.sql.Encoders.scalaLong)
        .flatMapGroups { (_: Long, rows: Iterator[org.apache.spark.sql.Row]) =>
          val ids = rows.map(_.getLong(0)).toArray
          if (ids.length < 2) Iterator.empty else pairLoop(ids)
        }(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("a_id", "b_id")
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      val both = inter
        .join(sizes.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("sz", "a_sz"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("sz", "b_sz"), "b_id")
      both.select(col("a_id"), col("b_id"),
          (col("inter").cast(DoubleType) / col("a_sz")).as("containment"))
        .unionAll(both.select(col("b_id").as("a_id"), col("a_id").as("b_id"),
          (col("inter").cast(DoubleType) / col("b_sz")).as("containment")))
        .filter(col("containment") >= 0.8)
    }

    def containmentHalved(): DataFrame = {
      val sh = Dedup.docShingleHashes(docs).cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = sh.as("a"); val b = sh.as("b")
      val inter = a.join(b, col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      val both = inter
        .join(sizes.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("sz", "a_sz"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("sz", "b_sz"), "b_id")
      both.select(col("a_id"), col("b_id"),
          (col("inter").cast(DoubleType) / col("a_sz")).as("containment"))
        .unionAll(both.select(col("b_id").as("a_id"), col("a_id").as("b_id"),
          (col("inter").cast(DoubleType) / col("b_sz")).as("containment")))
        .filter(col("containment") >= 0.8)
    }

    def lshCandidatesGrouped(): DataFrame =
      Dedup.minHashBandsFromDocs(docs)
        .groupByKey(r => (r.getInt(1), r.getLong(2)))(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaInt,
            org.apache.spark.sql.Encoders.scalaLong))
        .flatMapGroups { (_, rows: Iterator[org.apache.spark.sql.Row]) =>
          val ids = rows.map(_.getLong(0)).toArray
          if (ids.length < 2) Iterator.empty else pairLoop(ids)
        }(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("a_id", "b_id").distinct()

    def t33Feats(repart: Boolean): DataFrame = {
      val d2 = docs.select(col("doc_id"), col("lang"),
        TF.tokens(lower(col("text"))).as("a"))
      val uni = d2.select(col("doc_id"), col("lang"),
        explode(col("a")).as("g"), lit(0).as("off"))
      val bi = d2.select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y))).as("g"),
        lit(128).as("off"))
      val f = uni.unionByName(bi)
        .select(col("doc_id"), col("lang"),
          ((conv(substring(md5(col("g")), 1, 4), 16, 10).cast(IntegerType) % 128)
            + col("off")).as("b"))
      if (repart) f.repartition(col("b")) else f
    }

    def t33Variant(repart: Boolean): DataFrame = {
      val feats = t33Feats(repart)
      val wts = feats.groupBy(col("b"))
        .agg(count(lit(1)).as("cr"),
          count(when(col("lang") === "en", 1)).as("ct"))
        .select(col("b"),
          (length(bin(col("ct") + 1)) -
            length(bin(col("cr") + 1))).cast(LongType).as("wt"))
      val scored = feats.join(broadcast(wts), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"), sum(col("wt")).as("sum_w"))
      val ranked = graft.operators.GlobalRank.withNtile(scored, "quartile", 4,
        Seq((col("sum_w").cast(DoubleType) / col("n_feats")).desc,
          col("doc_id").asc))
      ranked.select(col("doc_id"), col("n_feats"),
        col("sum_w"), col("quartile"), (col("quartile") === 1).as("selected"))
    }

    def q41NoCkpt(): DataFrame = {
      val Scale = 1000000L; val Base = 150000L; val Damp = 850000L
      val Off = 10000000L
      val e0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(spark.read.parquet(s"$sfDir/orders.parquet")
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val ed = e0.select(col("c").as("src"), (col("s") + lit(Off)).as("dst"))
        .unionAll(e0.select((col("s") + lit(Off)).as("src"),
          col("c").as("dst")))
        .localCheckpoint()
      val degrees = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .select(col("src").as("v"), col("d")).localCheckpoint()
      var r = degrees.select(col("v"), col("d"), lit(Scale).as("r"))
      for (_ <- 1 to 4) {
        val m = ed.join(broadcast(r), col("src") === col("v"))
          .select(col("dst"), expr("r DIV d").as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
        r = degrees.join(broadcast(m), col("v") === col("dst"), "left")
          .select(col("v"), col("d"), (lit(Base) +
            expr(s"($Damp * coalesce(m, CAST(0 AS BIGINT))) DIV $Scale"))
            .as("r"))
      }
      r.filter(col("v") >= Off)
        .select((col("v") - Off).as("s_suppkey"), col("r").as("rank_fp"),
          col("d").as("n_neighbors"))
    }

    def t33Mapper(): DataFrame = {
      val perDoc = docs
        .select(col("doc_id").cast("long"), col("lang").cast("string"),
          col("text").cast("string"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, lang, text) =>
            val t = text.trim.toLowerCase.split("\\s+")
            val cnt = new Array[Long](256)
            def bucket(g: String, off: Int): Unit = {
              md.reset()
              val d = md.digest(g.getBytes("UTF-8"))
              val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
              cnt(v % 128 + off) += 1
            }
            var i = 0
            while (i < t.length) {
              bucket(t(i), 0)
              if (i + 1 < t.length) bucket(t(i) + " " + t(i + 1), 128)
              i += 1
            }
            val isEn = lang == "en"
            (0 until 256).iterator.filter(cnt(_) > 0)
              .map(b => (id, isEn, b, cnt(b)))
          }
        }
        .toDF("doc_id", "is_en", "b", "cnt")
        .repartition(col("doc_id"))
      val wts = perDoc.groupBy(col("b"))
        .agg(sum(col("cnt")).as("cr"),
          sum(when(col("is_en"), col("cnt")).otherwise(0L)).as("ct"))
        .select(col("b"),
          (length(bin(col("ct") + 1)) -
            length(bin(col("cr") + 1))).cast(LongType).as("wt"))
      val scored = perDoc.join(broadcast(wts), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_feats"),
          sum(col("cnt") * col("wt")).as("sum_w"))
      val ranked = graft.operators.GlobalRank.withNtile(scored, "quartile", 4,
        Seq((col("sum_w").cast(DoubleType) / col("n_feats")).desc,
          col("doc_id").asc))
      ranked.select(col("doc_id"), col("n_feats"),
        col("sum_w"), col("quartile"), (col("quartile") === 1).as("selected"))
    }

    variants.foreach {
      case "cur-q41" =>
        time("cur-q41")(SparkEntry.queries("q41_graph_rank")(spark, sfDir))
      case "q41-nockpt" => time("q41-nockpt")(q41NoCkpt())
      case "xcheck-q41" =>
        xcheck("q41-nockpt",
          SparkEntry.queries("q41_graph_rank")(spark, sfDir), q41NoCkpt())
      case "t33-mapper" => time("t33-mapper")(t33Mapper())
      case "xcheck-t33m" =>
        xcheck("t33-mapper",
          SparkEntry.queries("t33_dsir_select")(spark, sfDir), t33Mapper())
      case "cur-containment" =>
        time("cur-containment")(Dedup.containmentPairs(docs, 0.8))
      case "containment-halved" =>
        time("containment-halved")(containmentHalved())
      case "containment-postings" =>
        time("containment-postings")(containmentPostings())
      case "xcheck-containment" =>
        xcheck("containment-halved",
          Dedup.containmentPairs(docs, 0.8), containmentHalved())
        xcheck("containment-postings",
          Dedup.containmentPairs(docs, 0.8), containmentPostings())
      case "cur-lshcand" =>
        time("cur-lshcand")(Dedup.minHashLshCandidates(docs))
      case "lshcand-grouped" =>
        time("lshcand-grouped")(lshCandidatesGrouped())
      case "xcheck-lshcand" =>
        xcheck("lshcand-grouped",
          Dedup.minHashLshCandidates(docs), lshCandidatesGrouped())
      case "cur-t33" =>
        time("cur-t33")(SparkEntry.queries("t33_dsir_select")(spark, sfDir))
      case "t33-shared" => time("t33-shared")(t33Variant(true))
      case "t33-twopass" => time("t33-twopass")(t33Variant(false))
      case "xcheck-t33" =>
        xcheck("t33-shared",
          SparkEntry.queries("t33_dsir_select")(spark, sfDir), t33Variant(true))
      case other => System.err.println(s"[probe] unknown variant $other")
    }
    spark.stop()
  }
}
