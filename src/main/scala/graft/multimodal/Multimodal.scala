package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in executor-side batches via
  * `mapPartitions` over typed Datasets (the Scala analog of
  * arrow-batched Python UDFs).
  *
  * The actual codec work is STUBBED — this container ships no
  * image/audio libraries — behind [[Codecs]]: the decode produces a
  * deterministic fake derived from the bytes, so the Spark-side
  * contract (schema, batching, partitioning, null handling) is real and
  * tested while the codec is swappable.
  *
  * Scale posture: assets never pass through the driver; decode and
  * feature extraction run per-partition with constant memory per row;
  * frame sampling is a generator (1 asset → N frame rows) via
  * flatMap — the same shape as `explode` but with imperative batch
  * control where a real decoder would own buffers.
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])
  final case class DecodedMeta(asset_id: Long, kind: String, width: Int,
      height: Int, channels: Int, n_bytes: Long)
  final case class MediaFeature(asset_id: Long, feature: Array[Float])
  final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  implicit val assetEnc = Encoders.product[MediaAsset]
  implicit val decodedEnc = Encoders.product[DecodedMeta]
  implicit val featureEnc = Encoders.product[MediaFeature]
  implicit val frameEnc = Encoders.product[Frame]

  /** The codec seam. A real deployment replaces these bodies with
    * actual decoders (JNI/FFI); everything around them is unchanged. */
  object Codecs {
    /** STUB decode: dimensions derived deterministically from content
      * bytes — stands in for reading the real header. */
    def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 512)
      val ht = 64 + math.abs((h / 512) % 512)
      (w, ht, 3)
    }

    /** STUB feature extractor: fixed-dim rolling byte statistics — the
      * real one embeds pixels/audio frames. Deterministic. */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, bytes.length / dim)
      var j = 0
      while (j < dim) { out(j) /= n; j += 1 }
      out
    }

    /** STUB frame sampler: every asset yields ceil(len/chunk) "frames"
      * of raw byte slices — the real one seeks keyframes. */
    def sampleFrames(bytes: Array[Byte], chunk: Int = 4096): Iterator[Array[Byte]] =
      bytes.grouped(chunk)
  }

  /** Build a deterministic media table from the documents corpus:
    * text bytes as fake payloads, kind round-robined — gives the
    * pipeline realistic row sizes without external assets. */
  def syntheticAssets(spark: SparkSession, d: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, d)
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaAsset(id, kind, text.getBytes("UTF-8"),
          Map("lang" -> lang, "codec" -> "fake"))
      }
  }

  /** Batched decode: per-partition loop, constant memory per row. */
  def decode(assets: Dataset[MediaAsset]): Dataset[DecodedMeta] =
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h, c) = Codecs.decodeDims(a.bytes)
        DecodedMeta(a.asset_id, a.kind, w, h, c, a.bytes.length.toLong)
      }
    }

  /** Batched feature extraction into a fixed-dim embedding column. */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 16): Dataset[MediaFeature] =
    assets.mapPartitions { it =>
      it.map(a => MediaFeature(a.asset_id, Codecs.features(a.bytes, dim)))
    }

  /** Frame sampling: 1 video asset → N frame rows (generator shape). */
  def sampleFrames(assets: Dataset[MediaAsset], chunk: Int = 64): Dataset[Frame] =
    assets.filter(_.kind == "video").flatMap { a =>
      Codecs.sampleFrames(a.bytes, chunk).zipWithIndex.map {
        case (b, i) => Frame(a.asset_id, i, b)
      }
    }

  /** Whole-pipeline summary per kind — the query a pipeline dashboard
    * would run; deterministic, so usable as a rows-only query. */
  def pipelineSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val assets = syntheticAssets(spark, d)
    val decoded = decode(assets)
    decoded.toDF()
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("total_bytes"),
        avg($"width").cast("decimal(10,2)").as("avg_width"))
      .orderBy($"kind")
  }
}
