package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract / frame-
  * sample run partition-wise over the binary payloads.
  *
  * The `mapPartitions` + `grouped(batchSize)` shape here is the Scala
  * analog of PySpark's `mapInPandas`: same input schema, same batched
  * iterator contract, same output-schema declaration — a Python deployment
  * swaps in `mapInPandas` with identical batch semantics (Arrow record
  * batches in place of the grouped iterator) and calls the real codec
  * (PIL/ffmpeg) inside the batch loop.
  *
  * STUB NOTE: no image/audio codec libraries exist in this container, so the
  * decode step is a clearly-marked deterministic fake (byte histogram /
  * chunk hashes). The Spark-side plumbing — schema, partition-wise batched
  * iteration, typed `Dataset` output, no driver collect — is real and is
  * what matters at 100 TB: payload bytes never leave the executors.
  */
object Multimodal {

  /** Feature row produced by the (stubbed) decoder. */
  final case class MediaFeature(id: Long, n_bytes: Int, feature: Array[Float])

  /** Frame-sampling output: one fingerprint per sampled frame. */
  final case class FrameSample(id: Long, frame: Int, fingerprint: Long)

  /** Attach an opaque media payload + typed metadata struct. The payload is
    * a deterministic fake (the UTF-8 bytes of a text column); a real
    * pipeline would read it from object storage as `binaryFile`. */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", struct(
      encode(col(textCol), "UTF-8").as("data"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(length(col(textCol)), lit(64)) + 1).cast("int").as("width"),
        (pmod(length(col(textCol)), lit(48)) + 1).cast("int").as("height")
      ).as("meta")))

  /** Partition-wise batched "decode" → fixed-size feature vector.
    * Batch shape mirrors a real vectorized decoder: payloads are processed
    * `batchSize` at a time inside each partition. */
  def extractFeatures(df: DataFrame, idCol: String,
                      dataCol: String = "media.data",
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            MediaFeature(id, bytes.length, fakeDecode(bytes))
          }
        }
      }
  }

  /** STUB decoder: 16-bin byte histogram, L1-normalized. Deterministic;
    * replace with a real codec call (JNI/external service) in production. */
  private[llm] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >>> 4) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Resized media row: payload downsampled, metadata updated. */
  final case class ResizedMedia(id: Long, width: Int, height: Int,
                                data: Array[Byte])

  /** STUB resize: deterministic stride-decimation of the payload (every
    * `factor`-th byte) with the metadata dimensions scaled to match — the
    * plumbing shape of an image resize (payload in, smaller payload +
    * consistent metadata out) without a codec. Partition-wise, typed. */
  def resize(df: DataFrame, idCol: String, factor: Int = 2): Dataset[ResizedMedia] = {
    require(factor >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media.data"),
        col("media.meta.width"), col("media.meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h) =>
          val out =
            if (bytes.isEmpty) Array.emptyByteArray
            else Array.tabulate(
              math.max(bytes.length / factor, 1))(i =>
                bytes(math.min(i.toLong * factor, bytes.length - 1L).toInt))
          ResizedMedia(id, math.max(w / factor, 1),
            math.max(h / factor, 1), out)
        }
      }
  }

  /** Frame sampling: split each payload into `frames` equal chunks and emit
    * one deterministic fingerprint (FNV-1a) per chunk — the shape of a
    * video keyframe sampler, stubbed. */
  def sampleFrames(df: DataFrame, idCol: String,
                   dataCol: String = "media.data",
                   frames: Int = 4): Dataset[FrameSample] = {
    require(frames >= 1, s"frames=$frames must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val chunk = math.max(bytes.length / frames, 1)
        (0 until frames).map { f =>
          val from = math.min(f * chunk, bytes.length)
          val until = if (f == frames - 1) bytes.length
                      else math.min((f + 1) * chunk, bytes.length)
          FrameSample(id, f, fnv1a(bytes, from, until))
        }
      }
  }

  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
