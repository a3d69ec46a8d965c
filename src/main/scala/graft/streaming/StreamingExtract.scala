package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
      // the salted exchange must actually happen: without this the bucket
      // column is pruned dead and a heavy-host micro-batch parses in
      // whatever file-partitions it arrived in (same skew the batch
      // pipeline's one exchange exists to spread)
      .repartition(buckets, $"bucket")
    val extracted = ExtractPipeline.parseStage(pages)(spark)
    extracted.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming ingestion of raw crawl archives: a watch-folder of arriving
    * `.warc(.gz)` segments → record extraction → salted parse → append
    * parquet. Same per-segment task shape as the batch
    * [[graft.sources.WarcSource]]; the file-stream checkpoint makes
    * segment processing exactly-once across restarts — the streaming
    * equivalent of the batch job's bucket-resume, at segment granularity. */
  def runFromWarc(spark: SparkSession, inputDir: String, outputDir: String,
                  checkpointDir: String, buckets: Int = 64): StreamingQuery = {
    import spark.implicits._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val pages = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(inputDir)
      .select($"content").as[Array[Byte]]
      .mapPartitions { files =>
        files.flatMap { bytes =>
          graft.sources.Warc.records(bytes).collect {
            case r if r.warcType == "response" =>
              (r.targetUri, graft.sources.WarcSource.parseTs(r.date),
                graft.sources.Warc.htmlPayload(r))
          }
        }
      }
      .toDF("url", "warc_ts", "html")
      .withColumn("bucket", ExtractPipeline.bucketCol($"url", buckets, 16, 0))
      .repartition(buckets, $"bucket") // see run(): dead without this
    ExtractPipeline.parseStage(pages)(spark).writeStream
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

  /** Content-digest key of a page (same two-digest+length scheme as
    * `operators.Dedup.exact` — see the collision math there). */
  final case class ContentKey(h1: Long, h2: Long, len: Int)
  final case class SeenState(count: Long, firstUrl: String)
  /** `firstBatchCopies` counts copies within the FIRST micro-batch a
    * digest appears in only — append mode cannot re-emit when later
    * recrawls arrive (the state store keeps the running total, but it is
    * not observable downstream). Named to not masquerade as
    * `Dedup.exact`'s whole-corpus `copies`. */
  final case class FirstSeen(url: String, h1: Long, h2: Long, firstBatchCopies: Long)

  /** Streaming exact dedup with CUSTOM STATE (flatMapGroupsWithState):
    * emit a page the first time its content digest is seen across the whole
    * stream; recrawls of identical content are suppressed. State (count +
    * first url per digest) lives in the streaming state store, so dedup
    * survives restarts via the checkpoint — the streaming analogue of
    * `Dedup.exact`, keyed the same way so only digests shuffle, never text.
    * At crawl scale the state store is RocksDB-backed and partitioned by the
    * digest key — the same equi-partitioning as the batch job's shuffle. */
  def firstSeenDedup(spark: SparkSession, inputDir: String): Dataset[FirstSeen] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = spark.readStream.schema(pageSchema).parquet(inputDir)
      .filter($"html".isNotNull)
      .select($"url", xxhash64($"html").as("h1"), xxhash64($"html", lit(1)).as("h2"),
        length($"html").as("len"))
      .as[(String, Long, Long, Int)]
      .groupByKey { case (_, h1, h2, len) => ContentKey(h1, h2, len) }
    keyed.flatMapGroupsWithState[SeenState, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: ContentKey, rows: Iterator[(String, Long, Long, Int)],
       state: GroupState[SeenState]) =>
        val batch = rows.toArray
        val prior = state.getOption
        val first = prior.map(_.firstUrl).getOrElse(batch.minBy(_._1)._1)
        val total = prior.map(_.count).getOrElse(0L) + batch.length
        state.update(SeenState(total, first))
        if (prior.isEmpty) Iterator(FirstSeen(first, key.h1, key.h2, batch.length.toLong))
        else Iterator.empty
    }
  }

  /** Drive [[firstSeenDedup]] to a parquet sink, draining available input. */
  def firstSeenDedupOnce(spark: SparkSession, inputDir: String, outputDir: String,
                         checkpointDir: String): StreamingQuery =
    firstSeenDedup(spark, inputDir).writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
