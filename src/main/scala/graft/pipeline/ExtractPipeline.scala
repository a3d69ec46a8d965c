package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.htmlx.HtmlParser
import graft.extract.Extractor

/** The Spark-native extraction pipeline (SURVEY.md §4.3):
  *
  * {{{
  * read(url, warc_ts, html)            — columns pruned before the typed stage
  * → filter(html nonnull, length > 0)  — Catalyst predicates, pushed to scan
  * → bucket = pmod(xxhash64(host, salt(url)), P)   — host salting breaks skew
  * → repartition(P, bucket)            — explicit shuffle #1
  * → mapPartitions(parse + extract)    — opaque typed stage, one row per page
  * → write extracted, partitionBy(bucket), dynamic overwrite
  * → metrics per (epoch, bucket) from the written files — checkpoint commit
  * }}}
  *
  * Resume = recompute buckets, anti-join against the metrics table, process
  * only pending buckets; the metrics append is the commit point, so a killed
  * run re-processes (and dynamically overwrites) exactly the unfinished
  * buckets. Parse is a pure function of the html bytes, so placement never
  * changes content — N-core and 4N-core runs are byte-identical.
  */
object ExtractPipeline {

  /** Max html size processed per row; larger rows degrade to error rows
    * rather than risking executor OOM at 100 TB scale. */
  val maxHtmlBytes: Int = 4 << 20

  /** url-host with tolerant fallback (CC URLs can be junk). */
  def hostCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(parse_url(url, lit("HOST")), url)

  /** Salted bucket: hash(host, salt(url)) spreads a heavy host over up to
    * `saltFactor` distinct buckets instead of one (SURVEY.md §2B). */
  def bucketCol(url: org.apache.spark.sql.Column, buckets: Int, saltFactor: Int,
                epoch: Int): org.apache.spark.sql.Column = {
    val salt = pmod(xxhash64(url, lit(epoch)), lit(saltFactor))
    pmod(xxhash64(hostCol(url), salt), lit(buckets)).cast("int")
  }

  /** Pure per-row parse+extract — the engine the reference implements as its
    * whole program (reference: SimpleHtmlParser.cs:60-65). `engine` may be
    * reused across rows (scratch persists; state reset per parse). */
  def parseOne(url: String, html: Array[Byte],
               engine: HtmlParser.Engine = new HtmlParser.Engine): ExtractedDoc = {
    try {
      if (html == null) return ExtractedDoc(url, "", Nil, 0, 0, null, Seq("null html"), ok = false)
      if (html.length > maxHtmlBytes)
        return ExtractedDoc(url, "", Nil, 0, 0, null, Seq(s"oversized html: ${html.length}"), ok = false)
      val parsed = engine.parseBytes(html)
      val ex = Extractor.extract(parsed.doc)
      ExtractedDoc(url, ex.text,
        ex.spans.map(s => SpanRow(s.start, s.end, s.path)).toSeq,
        ex.charCount, ex.nodeCount, parsed.detectedCharset.orNull,
        parsed.errors, ok = true)
    } catch {
      case t: Throwable =>
        ExtractedDoc(url, "", Nil, 0, 0, null,
          Seq(s"parse failure: ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}"),
          ok = false)
    }
  }

  /** Typed parse stage over pre-bucketed pages; one reused engine per
    * partition (the reference's biggest throughput lever, SURVEY.md §4.1). */
  def parseStage(pages: DataFrame)(implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._
    pages.select($"url", $"html")
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val engine = new HtmlParser.Engine
        rows.map { case (url, html) => parseOne(url, html, engine) }
      }
  }

  final case class RunResult(pendingBuckets: Int, rowsProcessed: Long)

  /** Full job: read → salt → parse → write → metrics; resumable per bucket. */
  def run(spark: SparkSession, inputPath: String, outputDir: String,
          buckets: Int = 64, saltFactor: Int = 16, epoch: Int = 0): RunResult = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val extractedPath = s"$outputDir/extracted"
    val metricsPath = s"$outputDir/metrics"

    val done: Set[Int] = TableIO.readMetrics(spark, metricsPath)
      .map(df => df.filter($"epoch" === epoch).select($"bucket").as[Int].collect().toSet)
      .getOrElse(Set.empty)

    val input = spark.read.parquet(inputPath)
      .select($"url", $"warc_ts", $"html") // prune text/lang before typed stage
      .filter($"html".isNotNull && length($"url") > 0)
      .withColumn("bucket", bucketCol($"url", buckets, saltFactor, epoch))

    val pending = input.filter(!$"bucket".isin(done.toSeq: _*) || lit(done.isEmpty))
    val pendingBuckets = buckets - done.size
    if (pendingBuckets <= 0) return RunResult(0, 0L)

    val t0 = System.currentTimeMillis()
    val repartitioned = pending.repartition(buckets, $"bucket")
    val extracted = parseStage(repartitioned)
      .withColumn("bucket", bucketCol($"url", buckets, saltFactor, epoch))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    extracted.write.mode("overwrite").partitionBy("bucket").parquet(extractedPath)

    // metrics from the durably-written files → commit point for resume
    val written = spark.read.parquet(extractedPath)
      .filter(!$"bucket".isin(done.toSeq: _*) || lit(done.isEmpty))
    val durMs = System.currentTimeMillis() - t0
    val metrics = written.groupBy($"bucket")
      .agg(
        count(lit(1)).as("rows"),
        sum(when($"ok", 1L).otherwise(0L)).as("ok"),
        sum(when($"ok", 0L).otherwise(1L)).as("failed"),
        sum($"char_count".cast("long")).as("char_sum"),
        sum(size($"errors")).cast("long").as("parse_errors"))
      .withColumn("epoch", lit(epoch))
      .withColumn("dur_ms", lit(durMs))
      .withColumn("finished_at", current_timestamp())
      .select($"epoch", $"bucket", $"rows", $"ok", $"failed", $"char_sum",
        $"parse_errors", $"dur_ms", $"finished_at")
    val rows = written.count()
    metrics.write.mode("append").parquet(metricsPath)
    RunResult(pendingBuckets, rows)
  }
}

/** IO seam: Parquet today, Iceberg when the runtime ships the jar
  * (SURVEY.md §1.2 — this sandbox has no Iceberg runtime; swapping
  * `format("parquet")` for `format("iceberg")` + table identifiers here is
  * the only change needed). */
object TableIO {
  def readMetrics(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try Some(spark.read.parquet(path)) catch { case _: Throwable => None }
  }
}
