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
    val ds = df.selectExpr(s"$idCol as id", s"$mediaCol as media")
      .as[(Long, Array[Byte])]
      .map { case (id, m) => MediaRow(id, m, kind) }
    decodeStage(ds, new StubDecoder)
  }
}
