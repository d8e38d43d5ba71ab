package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2C `multimodal_meta`):
  * image/audio/video payloads ride as opaque `binary` columns with
  * typed metadata beside them. The reference's BLOB palette entry
  * (lib/query.py:11 `cover BLOB`) maps to Spark BinaryType the same
  * way (SURVEY.md §5).
  *
  * The *decode* step (image decode, audio resample, frame sampling)
  * needs native libraries that are intentionally not in this
  * container, so `decodeStub` is a clearly-marked deterministic fake
  * — but the Spark-side plumbing around it (binary schema, batch
  * iterator shape, per-partition execution, typed output schema) is
  * the real thing a production decoder would drop into.
  *
  * Scale notes: metadata extraction is map-only codegen'd math; the
  * decode path is `mapPartitions` (one JVM-side batch iterator per
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

  /** Typed output row of the decoder. */
  case class DecodedDoc(
      doc_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** Typed output row of the frame sampler (1→N decode shape). */
  case class SampledFrame(
      doc_id: Long, kind: String, frame_idx: Int, frame_off: Long, n_bytes: Long)

  val FeatureDim = 4

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio/video) and emit feature vectors; this container has
    * no media libraries, so features are a deterministic fake derived
    * from the payload bytes. The per-partition iterator (decoder
    * setup amortized per partition), input (doc_id, kind, payload)
    * and typed output schema are production-shaped.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // a real decoder would open its native context here, once
        rows.map { case (docId, kind, rawPayload) =>
          // null payload (a null source text cast to binary) decodes
          // like empty media instead of NPE-ing the whole task
          val payload =
            if (rawPayload == null) Array.emptyByteArray else rawPayload
          // --- stub: replace with a real decode --------------------
          val feats = (0 until FeatureDim).map { i =>
            if (payload.isEmpty) 0.0f // empty media ⇒ zero features
            else (payload((i * 7) % payload.length) & 0xff) / 255.0f
          }.toArray
          // ---------------------------------------------------------
          DecodedDoc(docId, kind, payload.length.toLong, feats)
        }
      }
      .toDF()
  }

  val FramesPerVideo = 3

  /** STUB frame sampler: the 1→N decode shape (a video payload emits
    * several frame rows, other modalities pass through as one row).
    * A real implementation would seek/decode; the stub slices the
    * payload at evenly spaced offsets. The flatMap-per-partition
    * shape, fan-out row multiplication, and typed schema are what a
    * production frame sampler drops into.
    */
  def frameSampleStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, kind, rawPayload) =>
          // null payload ⇒ empty media (see decodeStub)
          val payload =
            if (rawPayload == null) Array.emptyByteArray else rawPayload
          val n = if (kind == "video") FramesPerVideo else 1
          (0 until n).iterator.map { i =>
            // --- stub: replace with a real seek+decode -------------
            val off = (payload.length.toLong * i) / n
            // -------------------------------------------------------
            SampledFrame(docId, kind, i, off, payload.length.toLong)
          }
        }
      }
      .toDF()
  }
}
