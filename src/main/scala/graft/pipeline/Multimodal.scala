package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (driver mandate): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus the batch-shaped
  * decode/feature-extract hooks a real pipeline plugs decoders into.
  *
  * The image/audio codec libraries are not in this container, so the decode
  * kernel itself is a clearly-marked deterministic STUB — everything
  * Spark-side (schema, batching, partition sizing, null handling, the
  * mapPartitions fan-out shape) is real and tested. A production decoder
  * replaces `stubDecode` only.
  */
object Multimodal {

  /** Media metadata carried next to every binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha256", StringType),
    StructField("mime", StringType)))

  /** Wrap a binary column with its metadata struct — cheap column algebra,
    * no data movement. */
  def withMediaMeta(df: DataFrame, binCol: String, mime: String): DataFrame =
    df.withColumn(s"${binCol}_meta", struct(
      length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("sha256"),
      lit(mime).as("mime")))

  /** STUB decoder: a real implementation would decode the media bytes
    * (e.g. JPEG → HxWxC tensor) inside this per-partition batch loop. The
    * stub emits a deterministic 8-dim "feature" derived from the payload
    * bytes so downstream plumbing (schema, joins, ANN) is exercised
    * honestly. Marked intentionally: replace for production. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake features below
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) = out(i % 8) + (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over binary payloads: the Scala analogue of a
    * `mapInPandas` batch UDF — mapPartitions so a real decoder amortizes
    * model/codec init once per partition (the batch shape that matters at
    * scale), emitting (id, features). */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec/model load in production)
        it.map { case (id, bytes) =>
          (id, if (bytes == null) null else stubDecode(bytes))
        }
      }
      .toDF("id", "features")
  }

  /** Frame/sample selector for time-media: pick every `stride`-th chunk of a
    * binary payload as pseudo-frames (stub for video frame sampling; the
    * chunking/explode shape is the real scale concern — one row in, many
    * frame rows out, handled by the generator without collecting). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int = 256, maxFrames: Int = 8): DataFrame =
    // payloads shorter than one frame yield ZERO frames (guard against
    // sequence(0,-1), which descends and would emit phantom frames)
    df.select(col(idCol), posexplode(expr(
      s"CASE WHEN length($binCol) < $frameBytes THEN array() ELSE " +
        s"transform(sequence(0, least(cast(length($binCol)/$frameBytes as int) - 1, ${maxFrames - 1})), " +
        s"i -> substring($binCol, i * $frameBytes + 1, $frameBytes)) END")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
}
