package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2.5 #55): image/audio/video travel as
  * opaque binary columns with typed metadata; decode/feature steps run
  * per-partition over the binary payloads.
  *
  * The Spark-side plumbing — schema, ingestion via binaryFile, partition
  * sizing, batch-shaped processing — is real. For IMAGES the codec is
  * real too: `imageIoDecode`/`resizeImages` ride the JDK's built-in
  * javax.imageio + AWT (PNG/JPEG/BMP/GIF, headless-safe, zero external
  * deps). Audio/video decode stays an injectable function with a
  * DETERMINISTIC STUB default (no such codecs in this container); swap
  * in a real codec (e.g. javacv) without touching the plan shape.
  */
object Multimodal {

  /** Typed media record: payload + metadata (mirrors binaryFile's schema
    * plus media fields a pipeline would attach at ingest). */
  final case class MediaRecord(
      path: String,
      modality: String,          // image | audio | video
      contentType: String,
      length: Long,
      content: Array[Byte])

  final case class MediaFeatures(
      path: String,
      modality: String,
      length: Long,
      width: Int, height: Int,   // stubbed decode output
      channels: Int,
      checksum: String)

  /** Ingest a directory of binary files as media records. */
  def readBinary(spark: SparkSession, path: String, modality: String,
                 contentType: String = "application/octet-stream"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), lit(modality).as("modality"),
        lit(contentType).as("contentType"), col("length"), col("content"))
      .as[MediaRecord]
  }

  /** Deterministic stand-in for a real decoder: derives "dimensions" from
    * the payload hash so tests are stable. Replace with a real codec. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val h = java.util.Arrays.hashCode(r.content)
    MediaFeatures(
      path = r.path, modality = r.modality, length = r.length,
      width = 16 + math.abs(h % 1024), height = 16 + math.abs((h / 1024) % 1024),
      channels = if (r.modality == "audio") 2 else 3,
      checksum = java.lang.Integer.toHexString(h))
  }

  /** Oracle-mirrorable stub: metadata derived from the byte length and an
    * md5 checksum only, so the SAME plumbing (Dataset[MediaRecord] →
    * mapPartitions decode → frame-sample explode) can be hash-checked
    * end-to-end against a SQL oracle. A real codec swaps in without
    * touching the plan. */
  def lengthStubDecode(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.content).map("%02x".format(_)).mkString
    MediaFeatures(r.path, r.modality, r.length,
      width = 16 + (r.length % 1024).toInt,
      height = 16 + ((r.length / 1024) % 1024).toInt,
      channels = if (r.modality == "audio") 2 else 3,
      checksum = hex)
  }

  /** REAL image decode via the JDK's built-in ImageIO (javax.imageio is
    * part of Java 17's java.desktop — PNG/JPEG/BMP/GIF/WBMP decode with
    * no external libraries, headless-safe). Width/height/channels come
    * from the actual pixel raster; use for the `image` modality and keep
    * the stubs for modalities whose codecs genuinely aren't present
    * (audio/video). */
  def imageIoDecode(r: MediaRecord): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
    require(img != null, s"undecodable image payload: ${r.path}")
    val md = java.security.MessageDigest.getInstance("MD5")
    MediaFeatures(r.path, r.modality, r.length,
      width = img.getWidth, height = img.getHeight,
      channels = img.getColorModel.getNumComponents,
      checksum = md.digest(r.content).map("%02x".format(_)).mkString)
  }

  /** Resize one image payload to (w, h), re-encoded as PNG — JDK-only
    * (AWT Graphics2D, headless-safe). */
  def resizeImageBytes(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(src != null, "undecodable image payload")
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Distributed image resize: per-partition over the binary payloads, the
    * same shuffle-free shape as feature extraction. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val resized = resizeImageBytes(r.content, w, h)
        r.copy(contentType = "image/png", length = resized.length, content = resized)
      }
    }
  }

  final case class AudioFeatures(
      path: String, length: Long,
      sampleRate: Float, channels: Int, frames: Long,
      durationSec: Double, rmsEnergy: Double)

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU ship
    * with Java 17 — no external libraries). Emits format metadata plus a
    * first-feature (RMS energy over PCM samples) as the
    * feature-extraction example. */
  def audioDecode(r: MediaRecord): AudioFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.content))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val bytes = in.readAllBytes()
      // PCM 16-bit little/big-endian RMS; other encodings report -1
      val rms =
        if (fmt.getSampleSizeInBits == 16 && bytes.length >= 2) {
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sum = 0.0; var n = 0
          while (bb.remaining() >= 2) { val s = bb.getShort / 32768.0; sum += s * s; n += 1 }
          math.sqrt(sum / n)
        } else -1.0
      AudioFeatures(r.path, r.length, fmt.getSampleRate, fmt.getChannels,
        frames, frames.toDouble / fmt.getSampleRate, rms)
    } finally in.close()
  }

  /** Distributed audio feature extraction — same per-partition shape. */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(audioDecode))
  }

  /** Feature extraction over partitions: one codec instance per partition
    * (the real-codec pattern — init once, stream the batch through). */
  def extractFeatures(media: Dataset[MediaRecord],
                      decode: MediaRecord => MediaFeatures = stubDecode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(decode)
    }
  }

  /** Frame sampling plan for video: explode N sample offsets per record —
    * the shuffle-free shape for distributing frame decode. */
  def sampleFrames(media: DataFrame, everyNBytes: Long = 1024): DataFrame =
    media.select(col("path"), col("length"),
        explode(sequence(lit(0L), greatest(col("length") - 1, lit(0L)), lit(everyNBytes)))
          .as("frame_offset"))

  // ---- perceptual image dedup ---------------------------------------------

  /** 64-bit average-hash (aHash) of an image payload: decode → 8×8
    * bilinear resize → integer BT.601 luma → threshold at the mean → one
    * bit per pixel, row-major. Robust to re-encoding, resizing, and mild
    * recompression — near-duplicate images land within a small hamming
    * distance, where byte-level md5 dedup sees nothing. All-integer math
    * (luma ×1000, mean compared via `l·64 > Σl`, ties → 0) so the hash
    * is platform-exact; JDK-only codecs, same as [[imageIoDecode]]. */
  def aHash64(content: Array[Byte]): Long = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(src != null, "undecodable image payload")
    val dst = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, 8, 8, null)
    } finally g.dispose()
    val lum = new Array[Long](64)
    var sum = 0L
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val rgb = dst.getRGB(x, y)
        val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        lum(i) = l; sum += l; i += 1; x += 1
      }
      y += 1
    }
    var h = 0L
    i = 0
    while (i < 64) { if (lum(i) * 64 > sum) h |= 1L << i; i += 1 }
    h
  }

  /** Per-partition image signatures: (id, sim) with sim = [[aHash64]].
    * Shuffle-free — the binary payloads never leave their input split;
    * only 16 bytes per image flow downstream. */
  def imageSignatures(media: DataFrame, idCol: String,
                      contentCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, aHash64(c)) })
      .toDF("id", "sim")
  }

  /** Near-duplicate image pairs at hamming ≤ `maxHamming` over the aHash:
    * rides the simhash banding discipline (4×16-bit bands — pigeonhole-
    * complete at maxHamming ≤ 3 — capped buckets via the bounded min-k
    * heap). The decode runs once per image in the scan stage; everything
    * that shuffles is (id, 64-bit signature). Output: (a, b, dist). */
  def imageNearDupPairs(media: DataFrame, idCol: String, contentCol: String,
                        maxHamming: Int = 3, maxBucket: Int = 64): DataFrame =
    Dedup.simhashPairsFromSig(imageSignatures(media, idCol, contentCol),
      maxHamming, maxBucket)

  /** Keep one representative per near-duplicate image group (min-id label
    * propagation over the pair graph — the corpus-dedup shape). */
  def dedupImages(media: DataFrame, idCol: String, contentCol: String,
                  maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    val pairs = imageNearDupPairs(media, idCol, contentCol, maxHamming, maxBucket)
    val reps = Dedup.representatives(pairs.select(col("a"), col("b")))
      .withColumnRenamed("id", "__rep_id").withColumnRenamed("rep", "__rep")
    media.join(reps, media(idCol).cast("long") === col("__rep_id"), "left")
      .filter(col("__rep").isNull || col("__rep") === media(idCol).cast("long"))
      .drop("__rep_id", "__rep")
  }
}
