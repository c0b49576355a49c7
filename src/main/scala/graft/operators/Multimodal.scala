package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed batch-at-a-time on executors.
  *
  * The container has no codec libraries, so the *decode* kernels are
  * deterministic stubs (clearly marked) — but everything Spark-side is
  * real and tested: the asset schema, binary payload flow through
  * shuffles, per-partition batch processing, feature extraction on raw
  * bytes, fixed-size chunking for oversized payloads, and the
  * metadata-driven dispatch a real pipeline uses. Swapping a stub for a
  * JNI/codec call changes one function body, not the pipeline.
  *
  * Scale notes: payloads stay opaque until the last stage (no byte-level
  * shuffle work before filtering on cheap metadata); chunking bounds task
  * memory for multi-GB videos; feature extraction is mapPartitions-style
  * per-batch so per-record setup cost (codec init) amortizes — the Scala
  * analogue of a Pandas-UDF batch.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed, cheap-to-filter
    * metadata. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = false)))

  case class AssetMeta(width: Option[Int], height: Option[Int],
      sampleRate: Option[Int], nFrames: Option[Int])

  // ---------------------------------------------------------------------
  // Decode stubs — the only parts that would call a codec library.
  // ---------------------------------------------------------------------

  /** STUB image decode: a real implementation calls a codec (e.g. via
    * JNI); this deterministic fake "decodes" width×height from a fake
    * 8-byte header and returns a row-major luma plane derived from the
    * payload bytes. Pipeline shape (bytes → W×H plane) is the real one. */
  def stubDecodeImage(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 8, "truncated payload")
    val w = ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF)
    val h = ((payload(2) & 0xFF) << 8) | (payload(3) & 0xFF)
    val plane = new Array[Byte](math.max(1, w) * math.max(1, h))
    var i = 0
    while (i < plane.length) {
      plane(i) = payload(8 + (i % (payload.length - 8)))
      i += 1
    }
    (w, h, plane)
  }

  /** STUB resize: nearest-neighbor on the fake luma plane — the real
    * kernel would be a codec/SIMD call with identical signature. */
  def stubResize(plane: Array[Byte], w: Int, h: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = plane(sy * w + (x * w / outW))
        x += 1
      }
      y += 1
    }
    out
  }

  /** STUB frame sampling for video: every k-th fixed-size frame slice. */
  def stubSampleFrames(payload: Array[Byte], frameBytes: Int,
      everyK: Int): Seq[Array[Byte]] = {
    val n = payload.length / math.max(1, frameBytes)
    (0 until n by math.max(1, everyK))
      .map(i => payload.slice(i * frameBytes, (i + 1) * frameBytes))
  }

  // ---------------------------------------------------------------------
  // Real byte-level operators (no stubbing needed).
  // ---------------------------------------------------------------------

  /** Fixed-size chunking: split payloads into (asset_id, chunk_idx,
    * chunk) rows — bounds memory per task for multi-GB payloads. Pure
    * codegen'd expressions (substring over binary inside a lambda). */
  def chunk(assets: DataFrame, chunkBytes: Int): DataFrame =
    assets.selectExpr("asset_id",
        s"""posexplode(transform(
           |  sequence(0, CAST((octet_length(payload) - 1) / $chunkBytes AS INT)),
           |  i -> substring(payload, i * $chunkBytes + 1, $chunkBytes)))""".stripMargin)
      .toDF("asset_id", "chunk_idx", "chunk")

  /** Batch feature extraction: per-partition iterator processing (the
    * Scala analogue of mapInPandas batches) producing
    * (asset_id, modality, feature vector, decoded meta). */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    val out = assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition (per-batch) codec init happens HERE, once
        it.map { case (id, modality, payload) =>
          val (w, h, plane) = modality match {
            case "image" | "video" => stubDecodeImage(payload)
            case _ => (0, 0, payload)
          }
          val hist = new Array[Long](16)
          var i = 0
          while (i < plane.length) { hist((plane(i) & 0xFF) >> 4) += 1; i += 1 }
          (id, modality, w, h, hist.toSeq)
        }
      }
    out.toDF("asset_id", "modality", "width", "height", "hist")
  }
}
