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

  // ------------------------------------------ perceptual-hash near-dup

  /** Brightness-grid cells per fake thumbnail (one dHash bit per cell). */
  val GridCells = 64

  /** Deterministic fake "visual content" bit i of a doc's thumbnail:
    * 16 base patterns (doc_id % 16 — the near-dup groups) with one
    * per-doc bit flipped on every third doc (the "re-encode noise").
    * Same-group pairs land at Hamming ≤ 2, cross-group ~24/64 apart.
    */
  def gridBit(docId: Long, i: Int): Int = {
    val base = if ((((docId % 16) * 31 + i * 17) % 5) < 2) 1 else 0
    val flip = if (docId % 3 == 0 && i == ((docId * 7) % 64).toInt) 1 else 0
    base ^ flip
  }

  /** Fake thumbnail container: "GRD1" magic + 65 brightness bytes whose
    * CONSECUTIVE DIFFERENCES encode [[gridBit]] (brightness walks ±1 from
    * 128, staying in [64, 192]) — a stand-in for decode + grayscale +
    * 9×8 downsample, the classic dHash preprocessing.
    */
  def encodeFakeGrid(docId: Long): Array[Byte] = {
    val out = new Array[Byte](4 + 1 + GridCells)
    "GRD1".getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(out)
    var b = 128
    out(4) = b.toByte
    var i = 0
    while (i < GridCells) {
      b = if (gridBit(docId, i) == 1) b - 1 else b + 1
      out(5 + i) = b.toByte
      i += 1
    }
    out
  }

  /** dHash from the binary (NOT from doc_id): bit i set iff
    * brightness[i] > brightness[i+1] — the difference hash of Krawetz's
    * classic construction, gradient-based so it survives brightness and
    * scale changes a real pipeline applies.
    */
  def dHashOf(bytes: Array[Byte]): Long = {
    require(bytes.length == 4 + 1 + GridCells &&
      new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "GRD1",
      "bad grid container")
    var h = 0L
    var i = 0
    while (i < GridCells) {
      if ((bytes(4 + i) & 0xFF) > (bytes(5 + i) & 0xFF)) h |= 1L << i
      i += 1
    }
    h
  }

  /** IMAGE near-duplicate pairs — the multimodal twin of
    * [[TextOps.simHashPairs]]: binary thumbnails decode per partition to
    * 64-bit dHashes, Hamming-space LSH splits each hash into 4 bands of
    * 16 bits (by pigeonhole, any pair within distance 3 shares ≥ 1 exact
    * band — banding is EXACT at maxDist ≤ 3, a recall guarantee), band
    * buckets emit verified pairs with the same hot-bucket star cap
    * discipline (quadratic work bounded by maxBucket, never by the
    * bucket). One signature pass + one band-keyed exchange.
    *
    * EXACTNESS BOUND: the pigeonhole all-pairs guarantee holds only while
    * every band bucket stays ≤ `maxBucket` — past that the star cap keeps
    * only hub pairs (the simHash trade-off, deliberate: an adversarial
    * all-identical-image corpus must not go quadratic). A corpus whose
    * true duplicate GROUPS exceed maxBucket members should raise the cap
    * to its expected group size (bucket size is structurally ≈ group
    * size here, since near-identical hashes share every band) — the mm05
    * gate's planted groups are far below the default cap, so it checks
    * the exact regime.
    */
  def imageNearDupPairs(
      documents: DataFrame,
      maxDist: Int = 3,
      maxBucket: Int = TextOps.DefaultMaxBucket): DataFrame = {
    require(maxBucket >= 2, s"maxBucket=$maxBucket must be >= 2")
    val spark = documents.sparkSession
    import spark.implicits._
    val bands = documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodeFakeGrid(id))))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val h = dHashOf(bytes)
        (0 until 4).iterator.map(b => (b, (h >>> (16 * b)) & 0xFFFFL, id, h))
      })
    // LOWEST-EMITTING-BAND dedup replaces the former `.distinct()`: a pair
    // within distance ≤ 3 collides in up to 4 band buckets, and the old
    // shape emitted it from every one, paying a full exchange + aggregate
    // over the multi-band pair multiset (~4× the result rows) just to
    // collapse duplicates. Instead each bucket emits a pair only when NO
    // lower band would: a lower shared band emits the pair iff its bucket
    // is not hot (clique) or its hub — the bucket's min id — is one of the
    // two (star). Bucket hotness and hubs come from one map-side-combined
    // aggregate (rows ∝ hot buckets, a corpus-adversarial handful) and
    // ride a broadcast, so the decision is fully local and the emitted
    // pair set is IDENTICAL to the old distinct's output, star cap
    // included.
    val hotHubs = bands.toDF("band", "v", "id", "h")
      .groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("hub"))
      .filter(col("n") > maxBucket)
      .select(col("band"), col("v"), col("hub"))
      .collect().map(r => (r.getInt(0).toLong << 16 | r.getLong(1)) -> r.getLong(2))
      .toMap
    val hotB = spark.sparkContext.broadcast(hotHubs)
    bands.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val band = key._1
        val hot = hotB.value
        val members = it.map(r => (r._3, r._4)).toArray.sortBy(_._1)
        def emit(x: (Long, Long), y: (Long, Long)) = {
          val d = java.lang.Long.bitCount(x._2 ^ y._2).toLong
          var lowerEmits = false
          var b = 0
          while (!lowerEmits && b < band) {
            val vx = (x._2 >>> (16 * b)) & 0xFFFFL
            if (vx == ((y._2 >>> (16 * b)) & 0xFFFFL)) {
              hot.get(b.toLong << 16 | vx) match {
                case None      => lowerEmits = true // lower clique bucket owns it
                case Some(hub) => if (hub == x._1 || hub == y._1) lowerEmits = true
              }
            }
            b += 1
          }
          if (d <= maxDist && !lowerEmits) Iterator.single((x._1, y._1, d))
          else Iterator.empty
        }
        if (members.length <= maxBucket)
          members.indices.iterator.flatMap(i =>
            (i + 1 until members.length).iterator.flatMap(j => emit(members(i), members(j))))
        else members.iterator.drop(1).flatMap(m => emit(members(0), m))
      }.toDF("a_id", "b_id", "hamming")
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
