package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * travels as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual image/audio decode is STUBBED (no codec libs in this
  * environment) behind `FakeDecoder` — a deterministic stand-in with the
  * same signature a real decoder would have. The Spark-side plumbing —
  * schema, partition-batched execution, row shape — is real and tested.
  *
  * Scale notes: `mapPartitions` keeps per-record decode off the driver
  * and amortizes decoder init per partition (the reason real pipelines
  * use partition-batched UDFs); binary payloads stay columnar in
  * Tungsten rows until the decode boundary.
  */
object Multimodal {

  /** Media column schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("source_id", LongType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Attach a deterministic fake media column to documents (text bytes
    * standing in for an image payload). */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      struct(
        col("text").cast(BinaryType).as("bytes"),
        lit("image/fake").as("mime"),
        col("doc_id").as("source_id")).as("media"))

  /** STUB decoder: where a real implementation would call an image
    * library on `bytes`, this derives deterministic pseudo-features
    * (length, additive checksum, fake dimensions). Signature and batch
    * shape match a real decoder drop-in.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte], mime: String, sourceId: Long): Row = {
      // ??? <- real decode goes here; deterministic fake below
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      Row(sourceId, mime, bytes.length, sum,
        256 + (sum % 256).toInt, 256 + ((sum / 256) % 256).toInt)
    }
  }

  /** Partition-batched feature extraction over the media column. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        // decoder init would happen once per partition here
        rows.map { r =>
          FakeDecoder.decode(r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frames, keep every `stride`-th — pure columnar ops, no
    * UDF, demonstrating explode-based fan-out that scales with input
    * splits. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media
      .select(col("media.source_id").as("source_id"),
        expr(s"transform(sequence(0, (octet_length(media.bytes) - 1) div $frameBytes), " +
          s"i -> named_struct('frame_no', i, 'frame', substring(media.bytes, i * $frameBytes + 1, $frameBytes)))")
          .as("frames"))
      .select(col("source_id"), explode(col("frames")).as("f"))
      .select(col("source_id"), col("f.frame_no").cast(IntegerType).as("frame_no"),
        col("f.frame").as("frame"))
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
}
