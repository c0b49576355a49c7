package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Fake image payload: 8-byte header (w, h big-endian shorts) + data. */
  private def fakeImage(id: Long, w: Int, h: Int): Row = {
    val header = Array[Byte](
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte, 0, 0, 0, 0)
    val data = Array.tabulate[Byte](64)(i => ((id * 31 + i) % 251).toByte)
    Row(id, "image", header ++ data,
      Row(w, h, null, null))
  }

  private def assets = spark.createDataFrame(
    Seq(fakeImage(1, 4, 3), fakeImage(2, 8, 8), fakeImage(3, 16, 2)).asJava,
    Multimodal.AssetSchema)

  test("decode stub recovers header dimensions and full plane") {
    val (w, h, plane) = Multimodal.stubDecodeImage(
      fakeImage(1, 4, 3).getAs[Array[Byte]](2))
    assert(w === 4 && h === 3 && plane.length === 12)
  }

  test("resize stub produces requested dimensions deterministically") {
    val (w, h, plane) = Multimodal.stubDecodeImage(
      fakeImage(2, 8, 8).getAs[Array[Byte]](2))
    val out = Multimodal.stubResize(plane, w, h, 4, 4)
    assert(out.length === 16)
    assert(out.toSeq === Multimodal.stubResize(plane, w, h, 4, 4).toSeq)
  }

  test("frame sampling slices every k-th frame") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.stubSampleFrames(payload, frameBytes = 10, everyK = 3)
    assert(frames.length === 4) // frames 0,3,6,9
    assert(frames.head.toSeq === (0 until 10).map(_.toByte))
  }

  test("chunking partitions payloads exactly and reassembles") {
    val chunked = Multimodal.chunk(assets, 16)
    // 72-byte payloads → 5 chunks (4×16 + 8)
    val counts = chunked.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 5L, 2L -> 5L, 3L -> 5L))
    val reassembled = chunked.orderBy("asset_id", "chunk_idx")
      .groupBy("asset_id")
      .agg(sum(expr("octet_length(chunk)")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reassembled.values.toSet === Set(72L))
  }

  test("batch feature extraction: decoded dims + 16-bin histogram") {
    val feats = Multimodal.extractFeatures(spark, assets).collect()
    assert(feats.length === 3)
    val byId = feats.map(r => r.getLong(0) ->
      (r.getInt(2), r.getInt(3), r.getSeq[Long](4))).toMap
    assert(byId(1L)._1 === 4 && byId(1L)._2 === 3)
    assert(byId(2L)._1 === 8 && byId(2L)._2 === 8)
    // histogram over the w*h plane sums to plane size
    assert(byId(1L)._3.sum === 12)
    assert(byId(2L)._3.sum === 64)
    assert(byId(1L)._3.length === 16)
  }

  test("metadata filters avoid touching payload bytes (cheap predicate)") {
    val wide = assets.filter(col("meta.width") >= 8)
    assert(wide.count() === 2)
  }
}
