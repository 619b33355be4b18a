package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * per-partition batch map (`mapPartitions`) so a real decoder would be
  * initialized once per task and fed batches — the Spark-side plumbing
  * (schema, partitioning, batch shape) is real and tested, while the
  * actual codec is STUBBED behind [[MediaDecoder]] (image/audio libraries
  * are not available in this build environment).
  */
object Multimodal {

  /** Typed metadata accompanying a binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType), // png|jpg|wav|mp4...
    StructField("payload", BinaryType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** The decode seam. A production build plugs a real codec here;
    * this build ships a deterministic fake (dimensions and an embedding
    * derived from the payload bytes) so every downstream operator — the
    * partition-level batching, schema, ANN over the embedding — runs for
    * real. */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, format: String, payload: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** Deterministic stand-in decoder. Like a real codec it reads the
    * container header for dimensions (magic "GRFT", u16 width/height, u8
    * frame count — see [[syntheticMedia]]); the pixel-decode step is the
    * fake: the embedding is hashed from the payload bytes instead of
    * running a model. Headerless payloads fall back to hash-derived
    * dimensions. */
  object FakeDecoder extends MediaDecoder {
    def decode(mediaType: String, format: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var h = 0xcbf29ce484222325L
      payload.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      val emb = Array.tabulate(16) { i =>
        val x = graft.functions.Hashing.mix64(h ^ i)
        (x.toDouble / Long.MaxValue).toFloat
      }
      if (payload.length >= 9 && payload(0) == 'G' && payload(1) == 'R' &&
          payload(2) == 'F' && payload(3) == 'T') {
        val w = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
        val ht = ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
        val frames = payload(8) & 0xff
        (w, ht, frames, emb)
      } else {
        val w = 64 + (math.abs(h) % 512).toInt
        val ht = 64 + (math.abs(h >> 16) % 512).toInt
        val frames = if (mediaType == "video") 1 + (math.abs(h >> 24) % 64).toInt else 1
        (w, ht, frames, emb)
      }
    }
  }

  /** 4×4 grid of mean luminance (Rec.601 weights), row-major, normalized
    * to [0,1] — the pixel-derived feature shared by the image and video
    * decode paths. */
  def lumaGrid4x4(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val emb = new Array[Float](16)
    var gy = 0
    while (gy < 4) {
      var gx = 0
      while (gx < 4) {
        val x0 = gx * w / 4; val x1 = math.max((gx + 1) * w / 4, x0 + 1)
        val y0 = gy * h / 4; val y1 = math.max((gy + 1) * h / 4, y0 + 1)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            n += 1
            x += 1
          }
          y += 1
        }
        emb(gy * 4 + gx) = if (n == 0) 0f else (sum / n).toFloat
        gx += 1
      }
      gy += 1
    }
    emb
  }

  /** REAL image decoding via the JDK's own ImageIO (PNG/JPEG/GIF/BMP —
    * no external dependency): dimensions from the actual decoded raster
    * and a pixel-derived embedding ([[lumaGrid4x4]]) — a genuine
    * decode→feature path. Non-image media and payloads ImageIO cannot
    * parse delegate to `fallback`. */
  final class ImageIoDecoder(fallback: MediaDecoder = FakeDecoder)
      extends MediaDecoder {
    def decode(mediaType: String, format: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (mediaType != "image") return fallback.decode(mediaType, format, payload)
      // NonFatal, not just IOException: the JDK readers throw unchecked
      // exceptions (IndexOutOfBounds, NegativeArraySize, IllegalArgument)
      // on malformed crawl payloads — one corrupt image must fall back,
      // not kill the job
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return fallback.decode(mediaType, format, payload)
      (img.getWidth, img.getHeight, 1, lumaGrid4x4(img))
    }
  }

  /** REAL audio decoding via the JDK's own `javax.sound.sampled`
    * (WAV/AIFF/AU PCM — no external dependency): the payload is parsed by
    * the actual JDK codec, and the feature row maps the audio facts onto
    * the media schema as `width` = sample rate (Hz), `height` = channel
    * count, `n_frames` = PCM sample frames. The embedding is a genuine
    * waveform feature: the signal is cut into 16 equal segments and each
    * slot holds that segment's RMS amplitude normalized to [0,1]
    * (16-bit samples / 32768). Non-audio media and payloads the codec
    * cannot parse delegate to `fallback` — after this decoder only the
    * video codec remains a declared stub. */
  final class WavDecoder(fallback: MediaDecoder = FakeDecoder)
      extends MediaDecoder {
    def decode(mediaType: String, format: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (mediaType != "audio") return fallback.decode(mediaType, format, payload)
      val stream =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (stream == null) return fallback.decode(mediaType, format, payload)
      try {
        val fmt = stream.getFormat
        val channels = fmt.getChannels
        val sampleRate = fmt.getSampleRate.toInt
        val bytes = stream.readAllBytes()
        val frameSize = math.max(1, fmt.getFrameSize)
        // trust the BYTES, not the header: a hostile/corrupt header can
        // claim ~4 GB of frames — header-derived counts overflow the
        // segment math into negative array indices (or burn ~1e9 no-op
        // iterations). Frames are whatever the payload actually holds.
        val claimed = stream.getFrameLength // may be NOT_SPECIFIED (-1)
        val nFrames = math.min(
          if (claimed < 0) Long.MaxValue else claimed,
          bytes.length.toLong / frameSize).toInt
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val big = fmt.isBigEndian
        val emb = new Array[Float](16)
        if (nFrames > 0 && bytesPerSample == 2) {
          var seg = 0
          while (seg < 16) {
            val f0 = (seg.toLong * nFrames / 16).toInt
            val f1 = math.max(((seg + 1).toLong * nFrames / 16).toInt, f0 + 1)
            var sumSq = 0.0; var n = 0
            var f = f0
            while (f < math.min(f1, nFrames)) {
              // first channel of the frame
              val o = f * frameSize
              if (o + 1 < bytes.length) {
                val s =
                  if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
                  else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
                sumSq += (s / 32768.0) * (s / 32768.0)
                n += 1
              }
              f += 1
            }
            emb(seg) = if (n == 0) 0f else math.sqrt(sumSq / n).toFloat
            seg += 1
          }
        }
        (sampleRate, channels, nFrames, emb)
      } catch {
        // decode-stage surprises on malformed payloads degrade to the
        // fallback row, never a task failure
        case scala.util.control.NonFatal(_) =>
          fallback.decode(mediaType, format, payload)
      } finally stream.close()
    }
  }

  /** Frame-container video ("GRFV"): magic + u16 width + u16 height +
    * u8 frame count, then per frame [u32 length][image bytes] — video as
    * a sequence of independently-coded images (the Motion-JPEG idea),
    * every frame decodable by the REAL JDK ImageIO codec. Inter-coded
    * foreign formats (mp4/h264) have no pure-JDK codec and stay on the
    * [[FakeDecoder]] seam. */
  def buildVideoContainer(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.size <= 255, "1..255 frames")
    val dataLen = frames.map(_.length + 4).sum
    val buf = java.nio.ByteBuffer.allocate(9 + dataLen)
    buf.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('V'.toByte)
      .putShort(w.toShort).putShort(h.toShort).put(frames.size.toByte)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Strict GRFV parse: Some((w, h, frames)) only when the magic matches
    * and every frame length lands exactly inside the payload. */
  def parseVideoContainer(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (payload.length < 9 || payload(0) != 'G' || payload(1) != 'R' ||
        payload(2) != 'F' || payload(3) != 'V') return None
    val buf = java.nio.ByteBuffer.wrap(payload)
    buf.position(4)
    val w = buf.getShort & 0xffff; val h = buf.getShort & 0xffff
    val n = buf.get() & 0xff
    val frames = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < n) {
      if (buf.remaining() < 4) return None
      val len = buf.getInt
      if (len < 0 || buf.remaining() < len) return None
      val f = new Array[Byte](len)
      buf.get(f)
      frames += f
      i += 1
    }
    Some((w, h, frames.result()))
  }

  /** REAL video decoding for [[buildVideoContainer]] payloads: every
    * frame runs through the actual JDK ImageIO codec; dimensions come
    * from the first decoded raster (not the header), `n_frames` is the
    * container's frame count, and the embedding is the per-frame
    * [[lumaGrid4x4]] averaged across frames — a genuine multi-frame
    * decode→feature path. Non-video media, foreign codecs, and corrupt
    * containers delegate to `fallback`. */
  final class VideoFramesDecoder(fallback: MediaDecoder = FakeDecoder)
      extends MediaDecoder {
    def decode(mediaType: String, format: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (mediaType != "video") return fallback.decode(mediaType, format, payload)
      parseVideoContainer(payload) match {
        case None => fallback.decode(mediaType, format, payload)
        case Some((_, _, frames)) =>
          val acc = new Array[Float](16)
          var w = 0; var h = 0; var decoded = 0
          frames.foreach { f =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img != null) {
              if (decoded == 0) { w = img.getWidth; h = img.getHeight }
              val g = lumaGrid4x4(img)
              var i = 0
              while (i < 16) { acc(i) += g(i); i += 1 }
              decoded += 1
            }
          }
          if (decoded == 0) return fallback.decode(mediaType, format, payload)
          var i = 0
          while (i < 16) { acc(i) /= decoded; i += 1 }
          (w, h, frames.size, acc)
      }
    }
  }

  /** The full real-codec chain this build ships: JDK ImageIO for images,
    * JDK javax.sound for audio, per-frame ImageIO for frame-container
    * video; [[FakeDecoder]] remains only for foreign codec formats. */
  def realDecoder(): MediaDecoder =
    new ImageIoDecoder(new WavDecoder(new VideoFramesDecoder(FakeDecoder)))

  /** Feature extraction over a media table: one decoder instance per
    * partition, rows processed in order (a real decoder would batch). */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("id", "media_type", "format", "payload").mapPartitions { rows =>
      val d = decoder // per-partition init seam
      rows.map { r =>
        val payload = if (r.isNullAt(3)) Array.emptyByteArray else r.getAs[Array[Byte]](3)
        val (w, h, frames, emb) = d.decode(r.getString(1), r.getString(2), payload)
        Row(r.getString(0), r.getString(1), w, h, frames, emb.toSeq)
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType)))

  /** Frame sampling over video payloads: per-partition decoder init, every
    * `everyN`th frame emitted. GRFV frame containers yield the ACTUAL
    * per-frame image bytes (each one decodable by ImageIO — the
    * multimodal_frame_sample oracle verifies real pixel values of the
    * sampled frames); foreign-codec payloads fall back to byte-range
    * slicing against the decoder's frame count (plumbing-only, the
    * declared stub path). */
  def sampleFrames(media: DataFrame, everyN: Int,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    // fail fast at the API: 0 would throw a bare 'step cannot be 0' deep
    // inside a task; negatives would silently emit an empty frame table
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("id", "media_type", "format", "payload").mapPartitions { rows =>
      val d = decoder
      rows.filter(_.getString(1) == "video").flatMap { r =>
        val payload = if (r.isNullAt(3)) Array.emptyByteArray else r.getAs[Array[Byte]](3)
        parseVideoContainer(payload) match {
          case Some((_, _, frames)) =>
            (0 until frames.size by everyN).iterator.map { f =>
              Row(r.getString(0), f, frames(f))
            }
          case None =>
            val (_, _, frames, _) = d.decode(r.getString(1), r.getString(2), payload)
            // Only strip the 9-byte container header when it is actually
            // present (same GRFT magic check the decoder uses); headerless
            // payloads keep byte ranges aligned with the frame count.
            val hasHeader = payload.length >= 9 && payload(0) == 'G' &&
              payload(1) == 'R' && payload(2) == 'F' && payload(3) == 'T'
            val body = if (hasHeader) payload.drop(9) else payload
            val per = math.max(1, body.length / math.max(frames, 1))
            (0 until frames by everyN).iterator.map { f =>
              val from = math.min(f * per, body.length)
              val until = math.min((f + 1) * per, body.length)
              Row(r.getString(0), f, java.util.Arrays.copyOfRange(body, from, until))
            }
        }
      }
    }(enc)
  }

  /** Resize planning as pure Catalyst integer arithmetic (no UDF): target
    * dimensions capped at `maxDim` preserving aspect ratio via exact
    * floor division — the planner-side half of a resize; pixel work is
    * decoder-side. */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    val mx = greatest(col("width"), col("height"))
    features
      .withColumn("out_width",
        when(mx <= maxDim, col("width"))
          .otherwise(floor(col("width") * maxDim / mx)).cast("int"))
      .withColumn("out_height",
        when(mx <= maxDim, col("height"))
          .otherwise(floor(col("height") * maxDim / mx)).cast("int"))
  }

  /** Deterministic synthetic media table for tests/bench. Image rows are
    * REAL PNGs (encoded with the JDK's ImageIO) of width 64+(i*37)%512,
    * height 64+(i*53)%512, filled with the constant gray (i*7)%256 — so
    * [[ImageIoDecoder]] exercises a genuine decode whose dimensions and
    * mean luminance are analytically known. Audio rows are REAL 16-bit
    * mono PCM WAVs at 8 kHz with 1600+(i*37)%2048 sample frames of
    * deterministic hash noise — so [[WavDecoder]] exercises a genuine
    * JDK decode whose rate/channels/frame count are analytically known.
    * Video rows are REAL GRFV frame containers — 1+(i*29)%64 frames,
    * each an actual PNG of 32+(i*37)%64 × 24+(i*53)%48 filled with the
    * constant gray (i*7 + f*11)%256 for frame f — so [[VideoFramesDecoder]]
    * and the frame-sample oracle exercise genuine per-frame ImageIO
    * decodes with analytically-known pixel values. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val mediaType = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val fmt = mediaType match {
        case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
      }
      val payload = if (mediaType == "image") {
        val w = 64 + ((i * 37) % 512).toInt
        val h = 64 + ((i * 53) % 512).toInt
        syntheticPng(w, h, ((i * 7) % 256).toInt)
      } else if (mediaType == "audio") {
        val nSamples = 1600 + ((i * 37) % 2048).toInt
        syntheticWav(8000, Array.tabulate(nSamples)(j =>
          (graft.functions.Hashing.mix64(i * 131 + j) & 0xffff).toShort))
      } else {
        val w = 32 + ((i * 37) % 64).toInt
        val h = 24 + ((i * 53) % 48).toInt
        val frames = 1 + ((i * 29) % 64).toInt
        buildVideoContainer(w, h, (0 until frames).map(f =>
          syntheticPng(w, h, ((i * 7 + f * 11) % 256).toInt)))
      }
      (s"m$i", mediaType, fmt, payload)
    }.toDF("id", "media_type", "format", "payload")
  }

  /** A real RIFF/WAVE file: canonical 44-byte PCM header + 16-bit
    * little-endian mono samples at `sampleRate` Hz. */
  def syntheticWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** A real PNG of the given dimensions filled with a constant gray. */
  def syntheticPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, w, h)
    } finally g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out), "no PNG writer")
    out.toByteArray
  }
}
