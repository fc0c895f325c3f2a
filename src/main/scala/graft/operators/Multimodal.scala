package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): treat image/audio/video as
  * opaque `binary` payloads with typed metadata, and run decode /
  * feature-extract / frame-sample as partition-local batch functions.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real;
  * the codec itself is a STUB (`FakeCodec`): this container has no
  * image/audio libraries, so decode is a deterministic fake that stands in
  * for (e.g.) a JNI/JEP call to a real decoder. Swapping `FakeCodec` for a
  * real one changes no plan shape: decode stays `mapPartitions`
  * (batch-amortized codec init, executor-local, no shuffle).
  */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("codec", StringType))))))

  /** Manufacture a deterministic media table from any (id, text) table —
    * payload = utf-8 bytes, metadata derived from the id. Lets every
    * downstream op be exercised on fixture data without real media files.
    */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
        (pmod(col(idCol) * 37, lit(1280)) + 64).cast("int").as("width"),
        (pmod(col(idCol) * 53, lit(720)) + 64).cast("int").as("height"),
        lit("fake/v1").as("codec")).as("meta"))

  /** Payload-level metadata extraction — pure expressions, no decode:
    * byte length + content hashes (dedup keys for binary columns).
    */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.modality").as("modality"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      sha2(col("payload"), 256).as("payload_sha256"))

  final case class MediaFeature(media_id: Long, modality: String, n_bytes: Int,
                                mean_byte: Double, frames_sampled: Int)

  /** ====== STUB: stands in for a real decoder (no media libs here). ======
    * Deterministic: "decodes" a payload to (mean byte value, frame count).
    * A real implementation would decode pixels/samples here — everything
    * around it (batching, schema, partition-locality) is production-shaped.
    */
  object FakeCodec {
    def decode(payload: Array[Byte], frameStride: Int): (Double, Int) = {
      // null payloads reach decode when the source row had null content
      // (synthesize maps null text → null binary); treat as empty media
      if (payload == null || payload.isEmpty) (0.0, 0)
      else {
        var s = 0L; var i = 0
        while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
        (s.toDouble / payload.length, (payload.length + frameStride - 1) / frameStride)
      }
    }
  }

  /** Decode/feature-extract via mapPartitions: codec state (here trivial;
    * in production a native decoder handle) is initialized once per
    * partition, then streamed over rows — the Spark-idiomatic shape for
    * expensive per-row native calls.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameStride: Int = 256): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "meta.modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { case (id, modality, payload) =>
          val (meanByte, frames) = FakeCodec.decode(payload, frameStride)
          MediaFeature(id, modality, if (payload == null) 0 else payload.length,
            meanByte, frames)
        }
      }
  }

  /** Frame sampling as pure expressions: cut the payload into fixed-stride
    * "frames" and keep every `everyNth` one — the plan shape of video
    * frame-sampling (generator + projection), minus the codec.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
