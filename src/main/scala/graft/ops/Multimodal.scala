package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension; SURVEY.md §2.11).
  *
  * Media (image/audio/video) are opaque `BinaryType` columns + typed
  * metadata structs; Parquet carries binary natively, so the storage/
  * partitioning/shuffle story is identical to any other wide column. The
  * actual codec step (JPEG decode, resample, frame-sample) needs native
  * libraries that are NOT in this container, so `decodeStub` below is a
  * clearly-marked deterministic fake; everything around it — schema,
  * batching, partition sizing — is real and tested.
  *
  * 100 TB notes: media rows are wide (MBs); keep
  * `spark.sql.files.maxPartitionBytes` at default 128 MB so tasks hold a
  * handful of blobs, never `collect()` them, and always project metadata
  * columns without the blob when the blob isn't needed (Parquet column
  * pruning makes metadata-only scans cheap).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Synthesize a deterministic media table from any id column — used by
    * tests and demos since the testdata has no binary table. Content bytes
    * are a seeded function of the id (sha2 of the id string, repeated).
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame =
    ids.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(sha2(col(idCol).cast("string"), 256), lit("hex")).as("content"),
      struct(
        (pmod(col(idCol).cast("long"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol).cast("long"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol).cast("long"), lit(60000))).as("duration_ms")).as("meta"))

  /** STUB — the real implementation decodes `content` with a codec library
    * (pillow/ffmpeg-class, unavailable in this container) inside
    * `mapPartitions`, one codec context per partition. The fake emits a
    * deterministic 8-dim "feature" derived from the bytes so downstream
    * plumbing (schema, partitioning, joins onto features) is fully
    * exercisable. Signature and batch shape match the real thing.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val featureAt = (i: Int) =>
      (pmod(xxhash64(col("content"), lit(i)), lit(1000003L)).cast("double") / 1000003.0)
    media.select(
      col("media_id"), col("kind"), col("meta"),
      length(col("content")).as("n_bytes"),
      array((0 until 8).map(featureAt): _*).as("features"))
  }

  /** Metadata-only projection — must NOT read the blob column from Parquet
    * (verify with .explain: ReadSchema excludes `content`).
    */
  def metadataScan(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms"))
}
