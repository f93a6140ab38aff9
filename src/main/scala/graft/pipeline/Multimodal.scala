package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (driver mandate): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus the batch-shaped
  * decode/feature-extract kernels.
  *
  * IMAGE payloads (PNG/JPEG/GIF/BMP) decode for REAL through the JDK's
  * bundled `javax.imageio` readers — no external codec libs needed — into
  * pixel-statistics features. Audio/video codecs are not in this
  * container, so non-image payloads fall back to a clearly-marked
  * deterministic STUB; everything Spark-side (schema, batching, partition
  * sizing, null handling, the mapPartitions fan-out shape) is identical
  * for both kernels.
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

  /** Real image decoder via the JDK's bundled ImageIO readers. Returns the
    * 8-dim feature vector [width, height, bands, meanR, meanG, meanB,
    * lumaMean, lumaStd] (channel means in [0,1]); None when the payload is
    * not a decodable image (magic-byte gate first, so non-image bytes
    * never pay a decode attempt). Runs inside the per-partition batch
    * loop of [[extractFeatures]]. */
  def decodeImage(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 8) return None
    def b(i: Int): Int = bytes(i) & 0xff
    val isPng = b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    val isJpg = b(0) == 0xff && b(1) == 0xd8
    val isGif = b(0) == 'G' && b(1) == 'I' && b(2) == 'F'
    val isBmp = b(0) == 'B' && b(1) == 'M'
    if (!(isPng || isJpg || isGif || isBmp)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val px = img.getRGB(0, 0, w, h, null, 0, w) // packed ARGB
      val n = px.length.toDouble
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val r = ((p >> 16) & 0xff) / 255.0
        val g = ((p >> 8) & 0xff) / 255.0
        val bl = (p & 0xff) / 255.0
        val luma = 0.299 * r + 0.587 * g + 0.114 * bl
        sr += r; sg += g; sb += bl; sl += luma; sl2 += luma * luma
        i += 1
      }
      val lm = sl / n
      val lvar = math.max(sl2 / n - lm * lm, 0.0)
      Some(Array(w.toFloat, h.toFloat, img.getRaster.getNumBands.toFloat,
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        lm.toFloat, math.sqrt(lvar).toFloat))
    } catch { case _: Exception => None }
  }

  /** Real audio decoder via the JDK's bundled javax.sound.sampled readers
    * (WAV/AIFF/AU, PCM up to 16-bit). Returns the 8-dim feature vector
    * [duration_sec, channels, sample_rate, rms, zero_crossing_rate, peak,
    * mean_abs, dc_offset] over samples normalized to [-1, 1]; None when no
    * reader accepts the payload (magic-byte gated first). */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 12) return None
    def b(i: Int): Int = bytes(i) & 0xff
    val isWav = b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
    val isAiff = b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M'
    val isAu = b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'
    if (!(isWav || isAiff || isAu)) return None
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais0 = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val f0 = ais0.getFormat
      // normalize to 16-bit signed PCM so sample extraction is uniform
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
        f0.getSampleRate, false)
      val ais = AudioSystem.getAudioInputStream(target, ais0)
      val data = ais.readAllBytes()
      val n = data.length / 2
      if (n == 0) return None
      var sumSq = 0.0; var sumAbs = 0.0; var sum = 0.0
      var peak = 0.0; var zc = 0L; var prevNeg = false
      var i = 0
      while (i < n) {
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort / 32768.0
        sumSq += s * s; sumAbs += math.abs(s); sum += s
        if (math.abs(s) > peak) peak = math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      val frames = n / f0.getChannels
      Some(Array(
        (frames / f0.getSampleRate).toFloat, f0.getChannels.toFloat,
        f0.getSampleRate, math.sqrt(sumSq / n).toFloat,
        (zc.toDouble / n).toFloat, peak.toFloat,
        (sumAbs / n).toFloat, (sum / n).toFloat))
    } catch { case _: Exception => None }
  }

  /** STUB decoder for media the JDK cannot decode (video, compressed
    * audio): a real implementation would decode inside the same
    * per-partition batch loop (the codec libs are not in this container).
    * The stub emits a deterministic 8-dim "feature" derived from the
    * payload bytes so downstream plumbing (schema, joins, ANN) is
    * exercised honestly. Marked intentionally: replace for production. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real audio/video codec goes here; deterministic fake features
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
        // per-partition init happens HERE (codec/model load in production);
        // disabling ImageIO's temp-file cache keeps decode fully in-memory
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          (id,
            if (bytes == null) null
            else decodeImage(bytes)
              .orElse(decodeAudio(bytes))
              .getOrElse(stubDecode(bytes)))
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
