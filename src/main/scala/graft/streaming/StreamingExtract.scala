package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.pipeline.ExtractPipeline

/** Structured-Streaming face of the extraction pipeline.
  *
  * The north rule is a batch job (SURVEY.md §2B marks streaming n/a), but the
  * per-partition parse stage is a pure function, so streaming is the same
  * plan under `readStream`: new page files appear → salted bucket → parse →
  * append extracted parquet, with exactly-once progress tracked by the
  * streaming checkpoint instead of the batch metrics table. Included to
  * demonstrate the seam; `Trigger.AvailableNow` drains the backlog and
  * stops, which is also how an incremental daily crawl run would look.
  */
object StreamingExtract {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Continuous extraction: input dir of page parquet → extracted parquet. */
  def run(spark: SparkSession, inputDir: String, outputDir: String,
          checkpointDir: String, buckets: Int = 64): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream.schema(pageSchema).parquet(inputDir)
      .select($"url", $"html")
      .filter($"html".isNotNull && length($"url") > 0)
      .withColumn("bucket", ExtractPipeline.bucketCol($"url", buckets, 16, 0))
    val extracted = ExtractPipeline.parseStage(pages)(spark)
    extracted.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Windowed crawl-rate metrics with a watermark: pages per host per
    * 1-hour event-time window (late data beyond 2 hours dropped). */
  def hostRate(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(pageSchema).parquet(inputDir)
      .withColumn("host", ExtractPipeline.hostCol($"url"))
      .withWatermark("warc_ts", "2 hours")
      .groupBy(window($"warc_ts", "1 hour"), $"host")
      .agg(count(lit(1)).as("pages"))
  }

  /** Drive [[hostRate]] to completion against a static dir (test/demo). */
  def hostRateOnce(spark: SparkSession, inputDir: String, checkpointDir: String,
                   outTable: String): StreamingQuery =
    hostRate(spark, inputDir).writeStream
      .format("memory")
      .queryName(outTable)
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
