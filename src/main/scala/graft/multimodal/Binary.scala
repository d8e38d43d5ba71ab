package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2C `multimodal_meta`):
  * image/audio/video payloads ride as opaque `binary` columns with
  * typed metadata beside them. The reference's BLOB palette entry
  * (lib/query.py:11 `cover BLOB`) maps to Spark BinaryType the same
  * way (SURVEY.md §5).
  *
  * Two decode seams live here:
  *  - [[decodeMedia]] is a REAL per-partition decoder over three real
  *    container formats — BMP (24-bpp DIB), canonical-header PCM WAV,
  *    and YUV4MPEG2 — sniffing the format from magic bytes and
  *    parsing headers + payload with nothing but the bytes
  *    ([[mediaPayload]] synthesizes valid files deterministically, so
  *    the DuckDB oracle can recompute every parsed value).
  *  - [[frameSample]] is the REAL 1→N frame sampler: it walks the
  *    Y4M stream frame by frame and emits each frame's true byte
  *    offset plus content/luma checksums (image/audio pass through
  *    as one frame row anchored at their located content).
  *
  * Scale notes: metadata extraction is map-only codegen'd math; the
  * decode paths are `mapPartitions` (one JVM-side batch iterator per
  * partition — the Scala analogue of `mapInPandas` batches), so
  * decoder setup cost amortizes per partition, not per row.
  */
object Binary {

  /** Attach a synthetic binary payload + modality kind to documents:
    * the UTF-8 bytes of the text stand in for real media bytes.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          // pmod, not %: a negative doc_id's truncating remainder
          // yields index 0 (a runtime error) or a negative index
          // (element_at counts from the END — the wrong modality)
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))

  /** Typed metadata over the opaque payload: size + content digest.
    * Pure column math — no decode needed, runs at scan speed.
    */
  def withMeta(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))

  // ===== real media encode/decode ==========================================
  //
  // The synthetic corpus has no real media files, so mediaPayload
  // SYNTHESIZES them — as structurally-valid files in three real
  // container formats whose content bytes are a pure function of
  // doc_id (so the DuckDB oracle can recompute what a correct parse
  // must find). decodeMedia then does the honest inverse: it sees
  // ONLY the bytes — sniffs the container from its magic, parses the
  // real header layout (little-endian DIB fields, RIFF chunk walk,
  // Y4M ASCII tokens), and folds the payload bytes it locates through
  // stride/chunk/frame arithmetic. A wrong stride, a mis-walked
  // chunk, or an off-by-one in the frame size changes payload_sum and
  // fails the oracle.

  /** Content byte k of doc `id` — the shared encoder/oracle formula.
    * (The decoder never uses it; it must find these bytes by parsing.)
    */
  private def contentByte(id: Long, k: Long): Byte =
    java.lang.Math.floorMod(id * 31 + k, 256L).toByte

  /** Typed output row of the real decoder. Field meaning is per kind:
    * image (width, height, bpp), audio (sample_rate, bits_per_sample,
    * n_samples), video (width, height, n_frames); `payload_sum` is
    * the sum of all located content bytes (pixels / samples / frame
    * planes), excluding structural bytes such as row padding.
    */
  case class MediaInfo(
      doc_id: Long, kind: String, f0: Long, f1: Long, f2: Long,
      payload_sum: Long)

  /** Synthesize one valid media file per document, modality by
    * doc_id mod 3 (same mapping as [[withPayload]]): BMP image, PCM
    * WAV audio, or Y4M video. Opaque binary out — consumers must
    * parse.
    */
  def mediaPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodeMedia(id))))
      .toDF("doc_id", "payload")
  }

  private[graft] def encodeMedia(id: Long): Array[Byte] =
    encodeMediaKind(id, java.lang.Math.floorMod(id, 3L))

  private[graft] def encodeMediaKind(id: Long, kind: Long): Array[Byte] =
    kind match {
      case 0L => encodeBmp(id)
      case 1L => encodeWav(id)
      case _  => encodeY4m(id)
    }

  import java.nio.{ByteBuffer, ByteOrder}

  /** 24-bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER):
    * width 4+id%13, height 3+id%7, rows padded to 4-byte boundaries
    * as the format requires. Pixel byte c of image row r carries
    * contentByte(r*w*3 + c).
    */
  private def encodeBmp(id: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(id, 13L)).toInt
    val h = (3 + java.lang.Math.floorMod(id, 7L)).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var rs = 0
    while (rs < h) {
      val r = h - 1 - rs // bottom-up storage order
      var c = 0
      while (c < w * 3) { bb.put(contentByte(id, r.toLong * w * 3 + c)); c += 1 }
      var p = w * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      rs += 1
    }
    bb.array()
  }

  /** Canonical 44-byte-header mono 8-bit PCM WAV: sample rate
    * 8000+(id%5)*2000, 64+id%101 samples, sample k = contentByte(k).
    */
  private def encodeWav(id: Long): Array[Byte] = {
    val rate = (8000 + java.lang.Math.floorMod(id, 5L) * 2000).toInt
    val n = (64 + java.lang.Math.floorMod(id, 101L)).toInt
    val bb = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate) // PCM, mono, byteRate=rate·1·1
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    var k = 0
    while (k < n) { bb.put(contentByte(id, k)); k += 1 }
    bb.array()
  }

  /** YUV4MPEG2 (C420): even dims w=4+2·(id%6), h=2+2·(id%4),
    * 1+id%3 frames of w·h·3/2 planar bytes each; content byte index
    * runs continuously across frames.
    */
  private def encodeY4m(id: Long): Array[Byte] = {
    val w = (4 + 2 * java.lang.Math.floorMod(id, 6L)).toInt
    val h = (2 + 2 * java.lang.Math.floorMod(id, 4L)).toInt
    val frames = (1 + java.lang.Math.floorMod(id, 3L)).toInt
    val frameBytes = w * h * 3 / 2
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = ByteBuffer.allocate(header.length + frames * (marker.length + frameBytes))
    out.put(header)
    var k = 0L
    var f = 0
    while (f < frames) {
      out.put(marker)
      var b = 0
      while (b < frameBytes) { out.put(contentByte(id, k)); k += 1; b += 1 }
      f += 1
    }
    out.array()
  }

  /** REAL per-partition media decoder: sniffs BMP / RIFF-WAVE /
    * YUV4MPEG2 from magic bytes and parses each for its typed
    * dimensions and content-byte sum — see [[MediaInfo]] for the
    * field meanings. Unknown or truncated payloads fail loudly with
    * the doc id (a production decoder would route these to the
    * exception channel, cdc/Exceptions).
    */
  def decodeMedia(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a codec-backed decoder would open its native context here, once
        rows.map { case (id, p) => parseMedia(id, p) }
      }
      .toDF()
  }

  /** Magic-byte container sniff alone (the dispatch half of
    * [[parseMedia]], without the parse): BM → image, RIFF/WAVE →
    * audio, YUV4MPEG2 → video, anything else → unknown.
    */
  private[graft] def sniffKind(p: Array[Byte]): String = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 2) == "BM") "image"
    else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") "audio"
    else if (ascii(0, 9) == "YUV4MPEG2") "video"
    else "unknown"
  }

  private def kindName(k: Long): String = k match {
    case 0L => "image"
    case 1L => "audio"
    case _  => "video"
  }

  /** Ingest-validation gate: declared modality (the catalog's
    * doc_id mod 3 contract) vs what the BYTES actually sniff as.
    * Real multimodal feeds carry mislabeled payloads (wrong
    * extension, wrong uploader pipeline); the fault is planted
    * deterministically — every doc_id % 17 == 0 ships the NEXT
    * modality's container — and the audit reports the (declared,
    * sniffed) census with the mismatch flag, the table a feed
    * on-boarding step reads before routing payloads to per-modality
    * decoders. The engine SNIFFS the synthesized bytes (same
    * magic-byte dispatch as [[decodeMedia]]); the oracle recomputes
    * expectations from the planting rule alone — a sniffer bug, not
    * just a planting bug, breaks the compare.
    *
    * Scale shape: map-only synthesize+sniff per document (no
    * shuffle before the census), then one ≤9-row aggregate.
    */
  def sniffMismatch(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val declared = java.lang.Math.floorMod(id, 3L)
        val actual =
          if (java.lang.Math.floorMod(id, 17L) == 0L)
            java.lang.Math.floorMod(id + 1, 3L)
          else declared
        (kindName(declared), sniffKind(encodeMediaKind(id, actual)))
      })
      .toDF("declared_kind", "sniffed_kind")
      .groupBy(col("declared_kind"), col("sniffed_kind"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("mismatch", col("declared_kind") =!= col("sniffed_kind"))
      .orderBy(col("declared_kind"), col("sniffed_kind"))
  }

  private[graft] def parseMedia(id: Long, p: Array[Byte]): MediaInfo = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 2) == "BM") parseBmp(id, p)
    else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") parseWav(id, p)
    else if (ascii(0, 9) == "YUV4MPEG2") parseY4m(id, p)
    else throw new IllegalStateException(
      s"doc $id: unrecognized media container (${p.length} bytes)")
  }

  private def parseBmp(id: Long, p: Array[Byte]): MediaInfo = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22) // positive ⇒ bottom-up, the only form emitted here
    val bpp = bb.getShort(28).toInt
    require(bpp == 24 && h > 0, s"doc $id: unsupported BMP variant (bpp=$bpp h=$h)")
    val stride = ((w * (bpp / 8) + 3) / 4) * 4
    var sum = 0L
    var r = 0
    while (r < h) {
      val rowStart = dataOff + r * stride
      var c = 0
      while (c < w * 3) { sum += (p(rowStart + c) & 0xff); c += 1 } // padding excluded
      r += 1
    }
    MediaInfo(id, "image", w.toLong, h.toLong, bpp.toLong, sum)
  }

  /** Validated RIFF chunk walk: (chunk id, payload offset, payload
    * size) per chunk, word-aligned advance, fail-loudly size bounds —
    * ONE definition of the walk contract for every WAV consumer (the
    * negative-size stall and the oversized-index crash are guarded
    * here, once).
    */
  private def riffChunks(
      id: Long, p: Array[Byte]): Seq[(String, Int, Int)] = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = 12 // past RIFF<size>WAVE
    while (off + 8 <= p.length) {
      val cid = new String(p, off, 4, "US-ASCII")
      val csz = bb.getInt(off + 4)
      require(csz >= 0 && off + 8 + csz.toLong <= p.length,
        s"doc $id: bad RIFF chunk size $csz at offset $off (${p.length} bytes)")
      out += ((cid, off + 8, csz))
      off += 8 + csz + (csz & 1) // RIFF chunks are word-aligned
    }
    out.toSeq
  }

  private def parseWav(id: Long, p: Array[Byte]): MediaInfo = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var rate = -1L; var bits = -1L; var n = -1L; var sum = 0L
    riffChunks(id, p).foreach {
      case ("fmt ", payload, _) =>
        rate = bb.getInt(payload + 4).toLong
        bits = bb.getShort(payload + 14).toLong
      case ("data", payload, csz) =>
        n = csz.toLong
        var k = payload
        val end = payload + csz
        while (k < end) { sum += (p(k) & 0xff); k += 1 }
      case _ => () // a real parser skips unknown chunks; so does this one
    }
    require(rate > 0 && n >= 0, s"doc $id: WAV missing fmt/data chunk")
    MediaInfo(id, "audio", rate, bits, n, sum)
  }

  private def parseY4m(id: Long, p: Array[Byte]): MediaInfo = {
    val headerEnd = p.indexOf('\n'.toByte)
    require(headerEnd > 0, s"doc $id: Y4M header unterminated")
    val tokens = new String(p, 0, headerEnd, "US-ASCII").split(' ')
    def param(tag: Char): Int = tokens.collectFirst {
      case t if t.length > 1 && t.head == tag => t.tail.toInt
    }.getOrElse(throw new IllegalStateException(s"doc $id: Y4M missing $tag"))
    val w = param('W'); val h = param('H')
    val frameBytes = w * h * 3 / 2 // C420: Y plane + quarter-size Cb/Cr
    var off = headerEnd + 1
    var frames = 0L; var sum = 0L
    while (off < p.length) {
      val fe = p.indexOf('\n'.toByte, off)
      require(fe > off && new String(p, off, 5, "US-ASCII") == "FRAME",
        s"doc $id: Y4M frame marker expected at $off")
      var k = fe + 1
      val end = fe + 1 + frameBytes
      while (k < end) { sum += (p(k) & 0xff); k += 1 }
      frames += 1
      off = end
    }
    MediaInfo(id, "video", w.toLong, h.toLong, frames, sum)
  }

  /** One decoded frame of a media payload. `frame_off` is the TRUE
    * byte offset of the frame's content inside the container (BMP
    * pixel array start, WAV data-chunk content, each Y4M frame's
    * plane bytes after its FRAME marker); `frame_bytes` counts the
    * content bytes located there (padding/markers excluded);
    * `frame_sum` checksums those bytes; `luma_sum` checksums the
    * luminance plane — the first w·h bytes of a C420 Y4M frame — and
    * equals `frame_sum` for the single-plane modalities (a BMP pixel
    * array and a PCM sample run have no separate chroma planes).
    */
  case class FrameRow(
      doc_id: Long, kind: String, frame_idx: Long, frame_off: Long,
      frame_bytes: Long, frame_sum: Long, luma_sum: Long)

  /** REAL frame sampler over the decoded containers: video payloads
    * fan out 1→N by walking the Y4M stream frame by frame (the same
    * header/marker walk [[parseY4m]] does), image/audio payloads pass
    * through as one frame row anchored at their located content. The
    * flatMap-per-partition shape is what a codec-backed sampler drops
    * into; the offsets and checksums here come from the bytes, not
    * from the payload length.
    */
  def frameSample(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a codec-backed sampler would open its native context here, once
        rows.flatMap { case (id, p) => parseFrames(id, p) }
      }
      .toDF()
  }

  private[graft] def parseFrames(id: Long, p: Array[Byte]): Seq[FrameRow] = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    def sumRange(from: Int, until: Int): Long = {
      var s = 0L; var k = from
      while (k < until) { s += (p(k) & 0xff); k += 1 }
      s
    }
    if (ascii(0, 2) == "BM") {
      // pixel array: bottom-up rows of stride bytes; content = w·3
      // bytes per row, the stride tail is structural padding
      val (dataOff, w, h, stride) = bmpHeader(id, p)
      var sum = 0L; var r = 0
      while (r < h) { sum += sumRange(dataOff + r * stride, dataOff + r * stride + w * 3); r += 1 }
      Seq(FrameRow(id, "image", 0L, dataOff.toLong, w.toLong * h * 3, sum, sum))
    } else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      // the one frame is the data chunk's sample run
      val row = riffChunks(id, p).collectFirst {
        case ("data", payload, csz) =>
          val s = sumRange(payload, payload + csz)
          FrameRow(id, "audio", 0L, payload.toLong, csz.toLong, s, s)
      }
      Seq(row.getOrElse(throw new IllegalStateException(s"doc $id: WAV missing data chunk")))
    } else if (ascii(0, 9) == "YUV4MPEG2") {
      val headerEnd = p.indexOf('\n'.toByte)
      require(headerEnd > 0, s"doc $id: Y4M header unterminated")
      val tokens = new String(p, 0, headerEnd, "US-ASCII").split(' ')
      def param(tag: Char): Int = tokens.collectFirst {
        case t if t.length > 1 && t.head == tag => t.tail.toInt
      }.getOrElse(throw new IllegalStateException(s"doc $id: Y4M missing $tag"))
      val w = param('W'); val h = param('H')
      val frameBytes = w * h * 3 / 2 // C420: w·h luma + two quarter chroma planes
      val out = Seq.newBuilder[FrameRow]
      var off = headerEnd + 1
      var idx = 0L
      while (off < p.length) {
        val fe = p.indexOf('\n'.toByte, off)
        require(fe > off && new String(p, off, 5, "US-ASCII") == "FRAME",
          s"doc $id: Y4M frame marker expected at $off")
        val start = fe + 1
        require(start + frameBytes <= p.length,
          s"doc $id: Y4M frame $idx truncated at $start")
        out += FrameRow(id, "video", idx, start.toLong, frameBytes.toLong,
          sumRange(start, start + frameBytes), sumRange(start, start + w * h))
        idx += 1
        off = start + frameBytes
      }
      out.result()
    } else throw new IllegalStateException(
      s"doc $id: unrecognized media container (${p.length} bytes)")
  }

  // ===== content feature extraction ========================================

  /** Per-document audio features from the REAL sample parse. Devs
    * are 8-bit PCM samples centered at the unsigned midpoint
    * (`dev = sample − 128`): `sum_sq_dev` is the exact integer
    * energy, `n_zero_cross` counts sign flips between consecutive
    * samples (silence/tone discriminator), `peak_dev` the absolute
    * peak, `duration_us` the integer microsecond length from the
    * parsed sample rate.
    */
  case class AudioFeatures(
      doc_id: Long, sample_rate: Long, n_samples: Long, sum_sq_dev: Long,
      n_zero_cross: Long, peak_dev: Long, duration_us: Long)

  /** Audio-stratum feature extractor: payloads whose magic bytes say
    * RIFF/WAVE parse for per-sample features; other modalities emit
    * no row (the op IS the audio stratum's profile — same flatMap-
    * per-partition seam as [[frameSample]], so a codec-backed
    * feature extractor drops in unchanged).
    */
  def audioFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) => parseAudioFeatures(id, p) }
      }
      .toDF()
  }

  private[graft] def parseAudioFeatures(
      id: Long, p: Array[Byte]): Option[AudioFeatures] = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var rate = -1L
    var feats: Option[(Long, Long, Long, Long)] = None
    riffChunks(id, p).foreach {
      case ("fmt ", payload, _) => rate = bb.getInt(payload + 4).toLong
      case ("data", payload, csz) =>
        var ssq = 0L; var cross = 0L; var peak = 0L
        var prevNeg = false
        var k = payload
        val end = payload + csz
        while (k < end) {
          val dev = (p(k) & 0xff) - 128
          ssq += dev.toLong * dev
          val neg = dev < 0
          if (k > payload && neg != prevNeg) cross += 1
          prevNeg = neg
          if (math.abs(dev) > peak) peak = math.abs(dev)
          k += 1
        }
        feats = Some((csz.toLong, ssq, cross, peak))
      case _ => ()
    }
    val (n, ssq, cross, peak) = feats.getOrElse(
      throw new IllegalStateException(s"doc $id: WAV missing data chunk"))
    require(rate > 0, s"doc $id: WAV missing fmt chunk")
    Some(AudioFeatures(id, rate, n, ssq, cross, peak, n * 1000000L / rate))
  }

  /** Energy-contour fingerprint census — the audio member of the
    * per-modality near-dup family (text: minhash shingles, image:
    * `imagePhashClusters`' perceptual hash): the PCM run is cut into
    * fixed [[AudioFpWindow]]-sample windows, each window's exact
    * integer energy Σdev² is compared to its predecessor, and the
    * strict-increase bits fold MSB-first into one integer — the
    * loudness-contour signature (the Chromaprint idea with energy
    * deltas standing in for the chroma filterbank the container's
    * 8-bit PCM can't feed). Docs sharing (window count, fingerprint)
    * have the same loudness shape — re-encoded or re-leveled copies
    * land together, which a byte-exact hash misses. Trailing samples
    * short of a full window are ignored (a sub-window tail is noise,
    * not contour).
    *
    * Scale shape: the parse+fold is flatMap-per-partition (bytes
    * force it, same seam as [[audioFeatures]]); the census is ONE
    * map-side-combined aggregate on the (windows, fingerprint) key —
    * output bounded by distinct contours, ≤ 2^windows.
    */
  case class AudioFp(doc_id: Long, n_windows: Long, fingerprint: Long)

  val AudioFpWindow = 16

  def audioFingerprintCensus(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parseAudioFp(id, p) })
      .toDF()
      .groupBy(col("n_windows"), col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("n_windows"), col("fingerprint"))
  }

  private[graft] def parseAudioFp(id: Long, p: Array[Byte]): Option[AudioFp] = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    riffChunks(id, p).collectFirst { case ("data", payload, csz) =>
      val nw = csz / AudioFpWindow
      if (nw == 0) None
      else {
        val energies = new Array[Long](nw)
        var w = 0
        while (w < nw) {
          var e = 0L
          var k = payload + w * AudioFpWindow
          val end = k + AudioFpWindow
          while (k < end) {
            val dev = (p(k) & 0xff) - 128
            e += dev.toLong * dev
            k += 1
          }
          energies(w) = e
          w += 1
        }
        var fp = 0L
        var i = 1
        while (i < nw) {
          fp = fp * 2 + (if (energies(i) > energies(i - 1)) 1L else 0L)
          i += 1
        }
        Some(AudioFp(id, nw.toLong, fp))
      }
    }.flatten
  }

  /** 2:1 decimation of the REAL PCM sample run — the audio "resize":
    * keep every other sample (the naive downsample an 8 kHz→4 kHz
    * pipeline starts from; a real one low-passes first, which is a
    * kernel choice, not different plumbing). Exact integer sums over
    * the kept samples prove the parser walked the right bytes. */
  case class AudioDecimated(
      doc_id: Long, sample_rate: Long, n_samples: Long, n_kept: Long,
      kept_sum: Long, kept_peak_dev: Long, out_rate: Long)

  def audioDecimated(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parseDecimated(id, p) })
      .toDF()
  }

  private[graft] def parseDecimated(
      id: Long, p: Array[Byte]): Option[AudioDecimated] = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var rate = -1L
    var out: Option[(Long, Long, Long, Long)] = None
    riffChunks(id, p).foreach {
      case ("fmt ", payload, _) => rate = bb.getInt(payload + 4).toLong
      case ("data", payload, csz) =>
        var sum = 0L; var peak = 0L; var kept = 0L
        var k = 0
        while (k < csz) {
          if (k % 2 == 0) {
            val b = p(payload + k) & 0xff
            sum += b
            val dev = math.abs(b - 128)
            if (dev > peak) peak = dev
            kept += 1
          }
          k += 1
        }
        out = Some((csz.toLong, kept, sum, peak))
      case _ => ()
    }
    val (n, kept, sum, peak) = out.getOrElse(
      throw new IllegalStateException(s"doc $id: WAV missing data chunk"))
    require(rate > 0, s"doc $id: WAV missing fmt chunk")
    Some(AudioDecimated(id, rate, n, kept, sum, peak, rate / 2))
  }

  /** 2×2 nearest-neighbor thumbnail of the REAL pixel array — the
    * resize step of an image pipeline, exercised on actual bytes:
    * each thumbnail pixel reads its source pixel through the full
    * offset math (pixel-array offset from the header, bottom-up row
    * order, 4-byte row padding). Values are the exact B+G+R integer
    * sums at the four sampled pixels. */
  case class Thumb(
      doc_id: Long, width: Long, height: Long,
      p00: Long, p01: Long, p10: Long, p11: Long, thumb_sum: Long)

  def thumbnails(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parseThumb(id, p) })
      .toDF()
  }

  private[graft] def parseThumb(id: Long, p: Array[Byte]): Option[Thumb] = {
    if (p.length < 2 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val (off, w, h, stride) = bmpHeader(id, p)
    def px(sy: Int, sx: Int): Long = {
      val rowStart = off + (h - 1 - sy) * stride // bottom-up storage
      var s = 0L
      var c = 0
      while (c < 3) { s += (p(rowStart + sx * 3 + c) & 0xff); c += 1 }
      s
    }
    val (p00, p01) = (px(0, 0), px(0, w / 2))
    val (p10, p11) = (px(h / 2, 0), px(h / 2, w / 2))
    Some(Thumb(id, w.toLong, h.toLong, p00, p01, p10, p11,
      p00 + p01 + p10 + p11))
  }

  /** Per-image channel statistics from the REAL pixel parse. BMP
    * stores pixels as BGR triplets, so channel sums come from the
    * byte's position mod 3 within its row's pixel run; padding bytes
    * are structural and excluded. `mean_brightness` is the one
    * double op over the exact integer channel sums.
    */
  case class ImageFeatures(
      doc_id: Long, width: Long, height: Long, n_pixels: Long,
      sum_b: Long, sum_g: Long, sum_r: Long, mean_brightness: Double)

  /** Image-stratum feature extractor: payloads whose magic bytes say
    * BM parse for per-channel statistics; other modalities emit no
    * row (same flatMap-per-partition seam as [[audioFeatures]]).
    */
  def imageFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) => parseImageFeatures(id, p) }
      }
      .toDF()
  }

  /** Decode + validate a 24-bpp BMP header: (pixel-array offset,
    * width, height, row stride). ONE definition of the fail-loudly
    * bounds contract (positive dims, 24 bpp, pixel array inside the
    * payload) for every BMP consumer — the copies had already
    * diverged once (parseFrames carried the bounds check, the
    * feature parsers didn't).
    */
  private def bmpHeader(id: Long, p: Array[Byte]): (Int, Int, Int, Int) = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    require(bpp == 24 && w > 0 && h > 0,
      s"doc $id: unsupported BMP variant (bpp=$bpp w=$w h=$h)")
    val stride = ((w * 3 + 3) / 4) * 4
    require(dataOff >= 0 && dataOff + stride.toLong * h <= p.length,
      s"doc $id: BMP pixel array out of bounds (w=$w h=$h off=$dataOff, " +
        s"${p.length} bytes)")
    (dataOff, w, h, stride)
  }

  private[graft] def parseImageFeatures(
      id: Long, p: Array[Byte]): Option[ImageFeatures] = {
    if (p.length < 2 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val (dataOff, w, h, stride) = bmpHeader(id, p)
    val sums = new Array[Long](3)
    var r = 0
    while (r < h) {
      val rowStart = dataOff + r * stride
      var c = 0
      while (c < w * 3) { sums(c % 3) += (p(rowStart + c) & 0xff); c += 1 }
      r += 1
    }
    val n = w.toLong * h
    Some(ImageFeatures(id, w.toLong, h.toLong, n, sums(0), sums(1), sums(2),
      (sums(0) + sums(1) + sums(2)).toDouble / (3.0 * n)))
  }

  /** Variance-of-Laplacian sharpness per image — the classic blur
    * gate a vision-data pipeline runs before spending encoder
    * compute (a defocused/duplicated-and-rescaled image has a
    * near-flat Laplacian response; a sharp one spikes at edges).
    * The 4-neighbor Laplacian runs over the per-pixel CHANNEL-SUM
    * plane (b+g+r, 0..765): every lap value and both moment sums
    * are exact integers; the variance is one double expression
    * (n·Σl² − (Σl)²)/n² over them. Interior pixels only
    * (x ∈ [1,w−2], y ∈ [1,h−2]); an image too small to have an
    * interior reports n_interior = 0 and a null variance.
    */
  case class BlurStats(
      doc_id: Long, width: Long, height: Long, n_interior: Long,
      sum_lap: Long, sum_lap_sq: Long, var_lap: Option[Double])

  /** Blur census over the image stratum: magic-byte-gated BMP walk
    * (same flatMap seam as [[imageFeatures]] — non-images emit no
    * row). Map-only at any scale.
    */
  def blurStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parseBlur(id, p) })
      .toDF()
  }

  private[graft] def parseBlur(id: Long, p: Array[Byte]): Option[BlurStats] = {
    if (p.length < 2 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val (dataOff, w, h, stride) = bmpHeader(id, p)
    // channel-sum plane in storage row order (a vertical mirror of
    // content order — the Laplacian moment sums are invariant to it)
    def s(x: Int, y: Int): Long = {
      val rowStart = dataOff + y * stride
      ((p(rowStart + x * 3) & 0xff) + (p(rowStart + x * 3 + 1) & 0xff) +
        (p(rowStart + x * 3 + 2) & 0xff)).toLong
    }
    var n = 0L
    var sl = 0L
    var sl2 = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val lap = 4 * s(x, y) - s(x - 1, y) - s(x + 1, y) -
          s(x, y - 1) - s(x, y + 1)
        n += 1; sl += lap; sl2 += lap * lap
        x += 1
      }
      y += 1
    }
    val v = if (n > 0)
      Some((n * sl2 - sl * sl).toDouble / (n * n).toDouble)
    else None
    Some(BlurStats(id, w.toLong, h.toLong, n, sl, sl2, v))
  }

  /** Dominant quantized color per image — the palette census a
    * near-dup triage keys on before any perceptual hash (two images
    * sharing a dominant 64-cell RGB bucket are palette candidates;
    * a corpus whose top cells collapse to one value is screenshots/
    * letterboxing). Each pixel maps to cell
    * (b÷64)·16 + (g÷64)·4 + (r÷64) ∈ [0,64); the per-image argmax
    * tie-breaks on the lowest cell id. All counts exact integers;
    * `top_share` is the one double division.
    */
  case class PaletteStats(
      doc_id: Long, width: Long, height: Long, n_pixels: Long,
      n_cells_used: Long, top_cell: Long, top_count: Long,
      top_share: Double)

  def paletteStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parsePalette(id, p) })
      .toDF()
  }

  private[graft] def parsePalette(
      id: Long, p: Array[Byte]): Option[PaletteStats] = {
    if (p.length < 2 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val (dataOff, w, h, stride) = bmpHeader(id, p)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val rowStart = dataOff + y * stride
      var x = 0
      while (x < w) {
        val b = (p(rowStart + x * 3) & 0xff) / 64
        val g = (p(rowStart + x * 3 + 1) & 0xff) / 64
        val r = (p(rowStart + x * 3 + 2) & 0xff) / 64
        counts(b * 16 + g * 4 + r) += 1
        x += 1
      }
      y += 1
    }
    var top = 0
    var used = 0L
    var cell = 0
    while (cell < 64) {
      if (counts(cell) > 0) used += 1
      if (counts(cell) > counts(top)) top = cell
      cell += 1
    }
    val n = w.toLong * h
    Some(PaletteStats(id, w.toLong, h.toLong, n, used, top.toLong,
      counts(top), counts(top).toDouble / n.toDouble))
  }

  /** Scene-cut detection over the REAL frame walk: per video, the
    * absolute luma-sum difference between consecutive frames — the
    * shot-boundary signal a frame-sampling pipeline keys on (sample
    * densely around cuts, sparsely inside still shots). `n_cuts`
    * counts diffs above `threshold`.
    *
    * Scale shape: rides [[frameSample]]'s fan-out; ONE (doc) window
    * over the per-frame relation (frames-per-video-bounded), then the
    * per-doc rollup in the same exchange.
    */
  def sceneCuts(frames: DataFrame, threshold: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.filter(col("kind") === "video")
      .withColumn("prev_luma", lag(col("luma_sum"), 1).over(w))
      .withColumn("diff", abs(col("luma_sum") - col("prev_luma")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        coalesce(sum(col("diff")), lit(0L)).as("sum_abs_diff"),
        sum(when(col("diff") > threshold, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(max(col("diff")), lit(0L)).as("max_diff"))
  }

  /** Luma-contour fingerprint census — the video member of the
    * per-modality near-dup family (text: minhash, image: phash,
    * audio: [[audioFingerprintCensus]]): per video, the
    * strict-increase bits between consecutive frames' luma sums fold
    * LSB-first into one integer (transition into frame i → bit i−1),
    * and docs sharing (frame count, fingerprint) have the same
    * brightness SHAPE over time — re-encoded / re-graded copies land
    * together where a byte hash separates them. Transitions past the
    * 63rd are ignored: one Long of opening-scene contour is the
    * bucket key (a 100 TB census key must be fixed-width; copies
    * agree on their opening frames as much as any others, and
    * collisions within a bucket are for a verify stage anyway).
    *
    * Scale shape: rides [[frameSample]]'s fan-out like [[sceneCuts]]
    * — ONE (doc) window and the per-doc fold share an exchange; the
    * census is a second map-side-combined aggregate, output bounded
    * by distinct contours.
    */
  def videoFingerprintCensus(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val bit = when(
      col("prev_luma").isNotNull && col("luma_sum") > col("prev_luma") &&
        col("frame_idx") <= lit(63L),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(frame_idx - 1 AS INT))"))
      .otherwise(lit(0L))
    frames.filter(col("kind") === "video")
      .withColumn("prev_luma", lag(col("luma_sum"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(bit).as("fingerprint"))
      .groupBy(col("n_frames"), col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("n_frames"), col("fingerprint"))
  }

  // --- voice-activity segmentation --------------------------------

  case class VadFrame(doc_id: Long, frame_idx: Long, energy: Long)

  /** Per-frame energy from the REAL PCM parse: 16-sample frames
    * (last partial frame kept), energy = Σ|sample − 128| of the
    * unsigned 8-bit samples — the integer activity signal a VAD /
    * silence-trimming pass thresholds. Same RIFF chunk walk (and
    * fail-loudly contract) as [[parseAudioFeatures]].
    */
  private[graft] def parseVadFrames(
      id: Long, p: Array[Byte], frameLen: Int): Seq[VadFrame] = {
    def ascii(from: Int, len: Int): String =
      if (p.length < from + len) "" else new String(p, from, len, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[VadFrame]
    riffChunks(id, p).foreach {
      case ("data", payload, csz) =>
        var k = 0
        while (k < csz) {
          var e = 0L
          var j = k
          val end = math.min(k + frameLen, csz)
          while (j < end) {
            e += math.abs((p(payload + j) & 0xff) - 128).toLong
            j += 1
          }
          out += VadFrame(id, (k / frameLen).toLong, e)
          k += frameLen
        }
      case _ => ()
    }
    out.toSeq
  }

  /** Voice-activity segmentation over the real PCM parse: frames
    * above the energy threshold are "active", consecutive active
    * frames merge into segments (the gaps-and-islands reduce —
    * `events_streak`'s pattern at audio-frame granularity), and each
    * audio doc reports its frame/activity/segment census — what a
    * silence-trimming pipeline uses to cut training clips.
    *
    * Scale shape: the frame fan-out is per-partition parsing
    * (bounded by samples ÷ frameLen per doc); ONE doc-keyed exchange
    * carries the island window and both rollups. No joins across
    * docs.
    */
  def vadSegments(
      df: DataFrame, frameLen: Int = 16, threshold: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val frames = df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseVadFrames(id, p, frameLen) })
      .toDF()
    val byDoc = Window.partitionBy(col("doc_id"))
    val active = frames.filter(col("energy") > threshold)
      .withColumn("grp",
        col("frame_idx") - row_number().over(
          byDoc.orderBy(col("frame_idx"))))
    val segs = active.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("seg_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        max(col("seg_len")).as("max_segment"))
    frames.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("energy") > threshold, 1L).otherwise(0L)).as("n_active"),
        max(col("energy")).as("max_energy"))
      .join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"), col("n_active"),
        col("max_energy"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_segment"), lit(0L)).as("max_segment"))
      .orderBy(col("doc_id"))
  }

  // --- perceptual hash / image near-dup ---------------------------

  /** 16-bit average-hash of one BMP from the REAL pixel parse: map
    * every pixel to a 4×4 grid cell ((r·4) div h, (c·4) div w), bit
    * = cell luma mean > image luma mean — tested EXACTLY by
    * cross-multiplication (cellSum·totalBytes > totalSum·cellBytes),
    * so no division ever rounds. Cells with no pixels (h or w < 4)
    * stay 0 by the same inequality. This is classic aHash at 4×4
    * (the corpus images are ≤16×9; an 8×8 grid would be mostly
    * empty), the representation image-dedup pipelines band on.
    */
  private[graft] def parsePhash(id: Long, p: Array[Byte]): Option[(Long, Long)] = {
    if (p.length < 2 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val (dataOff, w, h, stride) = bmpHeader(id, p)
    val cellSum = new Array[Long](16)
    val cellCnt = new Array[Long](16)
    var total = 0L
    var r = 0
    while (r < h) {
      // stored bottom-up: storage row r is image row h-1-r; the grid
      // is defined over IMAGE rows so the hash is orientation-true
      val row = h - 1 - r
      val rowStart = dataOff + r * stride
      val gr = row * 4 / h
      var c = 0
      while (c < w * 3) {
        val gc = (c / 3) * 4 / w
        val v = (p(rowStart + c) & 0xff).toLong
        cellSum(gr * 4 + gc) += v
        cellCnt(gr * 4 + gc) += 1
        total += v
        c += 1
      }
      r += 1
    }
    val totalCnt = 3L * w * h
    var hash = 0L
    var k = 0
    while (k < 16) {
      if (cellSum(k) * totalCnt > total * cellCnt(k)) hash |= (1L << k)
      k += 1
    }
    Some((id, hash))
  }

  /** Image near-duplicate census by perceptual hash: aHash every BMP
    * ([[parsePhash]]), collapse identical hashes into clusters (the
    * exact-dup reduce), then find near clusters (hamming ≤ 2) by
    * 4-bit LSH banding over the DISTINCT hashes (≥ 2 of 4 bands
    * intact by pigeonhole — `dedup_simhash`'s scheme) with an exact
    * `bit_count(xor)` verify. Per cluster: size, canonical doc, and
    * the near-cluster/near-image mass a semantic image-dedup pass
    * would merge.
    *
    * Scale design: a PAIR relation over near-dup images is
    * inherently quadratic when the corpus is self-similar (the first
    * cut measured 78× for 10× data on exactly that blowup) — but the
    * distinct-hash relation is bounded by the 2¹⁶ hash space no
    * matter the corpus, so clustering FIRST makes the banded join's
    * input, output, and the final census all corpus-size-bounded;
    * multiplicities ride along as counts. One identity shuffle on
    * phash + the bounded band join.
    */
  def phashClusters(df: DataFrame, maxHamming: Int = 2): DataFrame = {
    // 4 bands x 4 bits over a 16-bit hash is pigeonhole-complete only
    // for hamming <= 3 (4+ differing bits can touch every band); fail
    // loudly rather than silently under-report near pairs.
    require(maxHamming <= 3,
      s"4-band x 4-bit candidate join is complete only for maxHamming <= 3, got $maxHamming")
    val groups = phashGroups(df)
    val bands = groups.select(col("phash"), col("n_images"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr("shiftright(phash, band * 4) & 15L"))
    val near = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.phash") =!= col("b.phash"))
      .select(col("a.phash").as("phash"), col("b.phash").as("pb"),
        col("b.n_images").as("nb"))
      .distinct()
      .filter(expr(s"bit_count(phash ^ pb) <= $maxHamming"))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_near_hashes"),
        sum(col("nb")).as("n_near_images"))
    groups.join(near, Seq("phash"), "left")
      .select(col("phash"), col("n_images"), col("min_doc"),
        coalesce(col("n_near_hashes"), lit(0L)).as("n_near_hashes"),
        coalesce(col("n_near_images"), lit(0L)).as("n_near_images"))
      .orderBy(col("phash"))
  }

  /** The exact-dup reduce shared by [[phashClusters]] and
    * [[phashFamilies]]: one identity shuffle on the 16-bit hash,
    * output bounded by the 2¹⁶ hash space regardless of corpus size.
    */
  private def phashGroups(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => parsePhash(id, p) })
      .toDF("doc_id", "phash")
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("min_doc"))
  }

  /** Image near-duplicate FAMILIES: where [[phashClusters]] reports
    * each hash's immediate hamming-≤2 neighborhood, this closes the
    * TRANSITIVE hull — connected components over the near-pair graph
    * (A≈B and B≈C put A and C in one family even at hamming 4, the
    * drift chain a template family actually forms) — and reports per
    * family the hash count, the total image mass a family-level
    * image-dedup pass would collapse, and the canonical (minimum)
    * doc. The image twin of `dedup_clusters`' text components.
    *
    * Scale design: the component graph's VERTICES are the distinct
    * hashes (≤ 2¹⁶, corpus-size-bounded — clustering identical
    * hashes first is what keeps the pair relation from going
    * quadratic in a self-similar corpus); edges come from the same
    * 4-bit band equi-join as the census (pigeonhole-complete for
    * hamming ≤ 2), and the contraction is Dedup.clusterLabels —
    * the checkpoint-truncated min-label machinery already proven on
    * text components. Singleton hashes (no near pair) keep their own
    * hash as family id via the left join.
    */
  def phashFamilies(df: DataFrame, maxHamming: Int = 2): DataFrame = {
    // Same band-scheme completeness bound as [[phashClusters]]: an
    // incomplete edge set would silently fragment families.
    require(maxHamming <= 3,
      s"4-band x 4-bit candidate join is complete only for maxHamming <= 3, got $maxHamming")
    val groups = graft.CacheScope.materialize(phashGroups(df))
    val bands = groups.select(col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr("shiftright(phash, band * 4) & 15L"))
    val pairs = graft.CacheScope.materialize(
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.phash") < col("b.phash"))
        .select(col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
        .filter(expr(s"bit_count(pa ^ pb) <= $maxHamming")))
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .union(pairs.select(col("pb").as("src"), col("pa").as("dst")))
    val labels = graft.ml.Dedup.clusterLabels(edges,
      knownEdgeCount = Some(2L * pairs.count()))
    groups.join(labels, groups("phash") === labels("v"), "left")
      .select(coalesce(col("label"), col("phash")).as("family_id"),
        col("n_images"), col("min_doc"))
      .groupBy(col("family_id"))
      .agg(count(lit(1)).as("n_hashes"),
        sum(col("n_images")).as("n_images"),
        min(col("min_doc")).as("min_doc"))
      .orderBy(col("family_id"))
  }
}
