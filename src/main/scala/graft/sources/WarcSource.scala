package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark ingestion of `.warc` / `.warc.gz` crawl archives into the
  * pipeline's page shape (url, warc_ts, html:binary).
  *
  * Parallelism model: one task per segment file via the binaryFile
  * source — the standard Spark-on-Common-Crawl pattern (segments are
  * ~1 GB, member-per-record gzip, which is not block-splittable without
  * a member index; file-level parallelism over tens of thousands of
  * segments saturates any cluster). Within a task the record iterator
  * streams off the decompressor, so memory is one file's bytes plus one
  * record's payload. Non-response records (warcinfo/request/metadata)
  * are dropped here; unparseable dates become null timestamps rather
  * than failing the file. */
object WarcSource {

  def parseTs(iso: String): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.Instant.parse(iso))
    catch { case _: RuntimeException => null }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select($"content")
      .as[Array[Byte]]
      .mapPartitions { files =>
        files.flatMap { bytes =>
          Warc.records(bytes).collect {
            case r if r.warcType == "response" =>
              (r.targetUri, parseTs(r.date), Warc.htmlPayload(r))
          }
        }
      }
      .toDF("url", "warc_ts", "html")
  }
}
