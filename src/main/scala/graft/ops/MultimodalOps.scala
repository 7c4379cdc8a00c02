package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The actual codecs are STUBBED with deterministic fakes (no image/audio
  * libraries in this environment) — what is REAL and tested is the Spark
  * side: binary column construction, schema, partition-batched decode
  * (`mapPartitions`, the Scala analogue of an Arrow-batched UDF), and the
  * exact metadata contract a real decoder would satisfy.
  */
object MultimodalOps {

  /** Fake image container: "IMG1" magic, big-endian i32 width/height, u8
    * channels, 16-byte payload (md5 of the doc id). A stand-in for a JPEG
    * header parse.
    */
  def encodeFakeImage(docId: Long): Array[Byte] = {
    val width = (64 + (docId % 512)).toInt
    val height = (64 + ((docId * 7) % 512)).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val payload = md.digest(docId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 1 + 16)
    buf.put("IMG1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(width).putInt(height).put(3.toByte).put(payload)
    buf.array()
  }

  final case class ImageMeta(doc_id: Long, width: Int, height: Int, channels: Int, payload_md5: String)

  /** The decode stub — a real implementation would hand `bytes` to an image
    * library here; the surrounding plumbing (batching, schema, failure
    * contract) is what this op actually provides.
    */
  def decodeFakeImage(docId: Long, bytes: Array[Byte]): ImageMeta = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, java.nio.charset.StandardCharsets.US_ASCII) == "IMG1", "bad magic")
    val width = buf.getInt; val height = buf.getInt; val channels = buf.get().toInt
    val payload = new Array[Byte](16); buf.get(payload)
    ImageMeta(docId, width, height, channels, payload.map("%02x".format(_)).mkString)
  }

  /** documents → (doc_id, img binary) → partition-batched decode →
    * typed metadata. The binary genuinely round-trips through a Spark
    * binary column (and any shuffle between).
    */
  def imageMetadata(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodeFakeImage(id))))
      .toDF("doc_id", "img")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeFakeImage(id, bytes) })
      .toDF()
  }

  /** Resize stub — the missing quarter of the multimodal quartet
    * (decode / feature-extract / frame-sample / RESIZE): decode the
    * container, halve the dimensions (min 1), produce a deterministic
    * "resampled" payload (md5 of old-payload × new-dims — where a real
    * implementation would run the interpolation kernel), re-encode the
    * container, and decode the result — the full binary round-trip a real
    * resize stage performs, with an exact SQL oracle.
    */
  def resizeHalf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = decodeFakeImage(id, encodeFakeImage(id))
        val w2 = math.max(img.width / 2, 1)
        val h2 = math.max(img.height / 2, 1)
        val payload = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${img.payload_md5}x${w2}x$h2"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 1 + 16)
        buf.put("IMG1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        buf.putInt(w2).putInt(h2).put(img.channels.toByte).put(payload)
        val out = decodeFakeImage(id, buf.array())
        (id, out.width.toLong, out.height.toLong, out.payload_md5)
      }).toDF("doc_id", "width", "height", "payload_md5")
  }

  /** Fake audio: 256 deterministic s16 samples per doc; "feature extract"
    * computes the integer energy (Σ s²) — exact, oracle-expressible.
    */
  val AudioSamples = 256

  def audioSample(docId: Long, i: Int): Long = ((docId * 31 + i * 17) % 65536) - 32768

  def audioEnergy(docId: Long): Long = {
    var e = 0L
    var i = 0
    while (i < AudioSamples) { val s = audioSample(docId, i); e += s * s; i += 1 }
    e
  }

  def audioFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          // encode: samples → little-endian s16 binary (the opaque column)
          val buf = java.nio.ByteBuffer.allocate(AudioSamples * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < AudioSamples) { buf.putShort(audioSample(id, i).toShort); i += 1 }
          (id, buf.array())
        }
      }.toDF("doc_id", "audio")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // decode + feature extract from the binary (not from doc_id)
          val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var e = 0L
          var i = 0
          while (i < AudioSamples) { val s = buf.getShort.toLong; e += s * s; i += 1 }
          (id, e)
        }
      }.toDF("doc_id", "energy_sq")
  }

  /** Fake video frame sampling: n_frames = 16 + doc_id % 16; sample 4
    * evenly spaced frames with their timestamps at 25 fps.
    */
  def frameSample(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val nFrames = 16 + (id % 16).toInt
        (0 until 4).map { s =>
          val frame = s * nFrames / 4
          (id, s, frame, frame * 40L) // 25 fps → 40 ms per frame
        }
      }.toDF("doc_id", "sample_no", "frame_no", "frame_ts_ms")
  }
}
