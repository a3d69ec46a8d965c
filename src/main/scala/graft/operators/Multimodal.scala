package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) plumbing: media travels as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs as a
  * batched per-partition stage.
  *
  * The decode itself is STUBBED — this container ships no image/audio
  * codecs — behind [[MediaDecoder]]; the Spark-side plumbing (schema,
  * batching, partition flow, deterministic fallback) is real and tested.
  * Swapping in a JNI/FFmpeg-backed decoder is a one-class change.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], kind: String)

  final case class MediaFeatures(
      id: Long,
      kind: String,
      byte_len: Int,
      frames: Int,
      checksum: Long,
      feature: Seq[Float])

  /** Decoder seam. Implementations must be deterministic per byte content. */
  trait MediaDecoder extends Serializable {
    /** Decode one media blob batch → per-blob (frames, feature vector). */
    def decodeBatch(batch: Seq[MediaRow]): Seq[(Int, Array[Float])]
  }

  /** Deterministic fake decoder: frames = byteLen % 30 + 1; feature = 8
    * pseudo-values from a bytewise hash. A real implementation would call
    * the native codec here (marked by the `realDecode` seam). */
  final class StubDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[(Int, Array[Float])] =
      batch.map { row =>
        val len = row.media.length
        val frames = len % 30 + 1
        var h = 1125899906842597L
        var i = 0
        while (i < len) { h = 31 * h + row.media(i); i += 1 }
        val feat = Array.tabulate(8)(j => ((h >>> (j * 8)) & 0xFF).toFloat / 255f)
        (frames, feat)
      }

    /** Real codec entry point (unimplemented in this container). */
    def realDecode(media: Array[Byte]): Nothing = ???
  }

  /** Batched decode stage: groups rows into `batchSize` chunks per
    * partition (the batch shape a vectorized/native decoder wants), no
    * shuffle. */
  def decodeStage(media: Dataset[MediaRow], decoder: MediaDecoder,
                  batchSize: Int = 32)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = decoder.decodeBatch(batch)
        batch.zip(decoded).map { case (row, (frames, feat)) =>
          var h = 1125899906842597L
          var i = 0
          while (i < row.media.length) { h = 31 * h + row.media(i); i += 1 }
          MediaFeatures(row.id, row.kind, row.media.length, frames, h, feat.toSeq)
        }
      }
    }
  }

  /** End-to-end helper used by the driver-gated query: binary column in,
    * features out. */
  def features(df: DataFrame, idCol: String, mediaCol: String, kind: String)
              (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ds = df.select(col(idCol).as("id"), col(mediaCol).as("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, m) => MediaRow(id, m, kind) }
    decodeStage(ds, new StubDecoder)
  }

  import org.apache.spark.sql.functions._

  /** Deterministic every-`stride`-th frame selection over decoded frame
    * counts, capped at `maxFrames` — the sampling stage a video pipeline
    * runs before feature extraction. Pure column math over the decode
    * stage's output: one narrow pass, explode only the selected indices
    * (never a row per source frame). Rows with frames ≤ 0 (a real decoder
    * can report 0 for a corrupt/empty blob; `sequence` would throw on the
    * illegal boundary and fail the whole job) produce no samples — the
    * `when` yields NULL and posexplode drops NULL arrays. */
  def frameSample(features: DataFrame, idCol: String, framesCol: String,
                  stride: Int = 4, maxFrames: Int = 8): DataFrame =
    features.select(col(idCol).as("id"), col(framesCol).as("frames"))
      .select(col("id"), col("frames"),
        posexplode(when(col("frames") > 0,
          slice(sequence(lit(0), col("frames") - 1, lit(stride)), 1, maxFrames))))
      .select(col("id"), col("pos").as("sample_idx"), col("col").as("frame_idx"))

  /** Aspect-preserving resize plan to fit a `target`×`target` box (never
    * upscale): the metadata a batched image-resize stage consumes. Source
    * dimensions come from the decoder; integer-exact math (floor of an
    * integer product quotient) so the plan is reproducible in plain SQL. */
  def resizePlan(dims: DataFrame, idCol: String, wCol: String, hCol: String,
                 target: Int = 224): DataFrame = {
    val w = col(wCol)
    val h = col(hCol)
    val needs = greatest(w, h) > target
    val dstW = when(!needs, w)
      .otherwise(when(w >= h, lit(target)).otherwise(floor(w * target / h).cast("int")))
    val dstH = when(!needs, h)
      .otherwise(when(h >= w, lit(target)).otherwise(floor(h * target / w).cast("int")))
    dims.select(col(idCol).as("id"), w.as("src_w"), h.as("src_h"),
      dstW.cast("int").as("dst_w"), dstH.cast("int").as("dst_h"))
  }

}
