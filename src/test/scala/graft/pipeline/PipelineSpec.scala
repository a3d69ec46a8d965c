package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end Spark pipeline tests (SURVEY.md §5.2-5): per-url byte equality
  * vs ground truth and vs the sequential engine, checkpoint/resume, metrics.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkEnv.session("local[4]", "graft-test", shufflePartitions = 8)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val tmp: String = Files.createTempDirectory("graft-pipe").toString
  private val rows = 300L
  private val buckets = 16

  override def beforeAll(): Unit = {
    SynthCorpusJob.write(spark, rows, s"$tmp/pages", partitions = 4)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pipeline output is byte-identical to ground truth for every url") {
    import spark.implicits._
    val res = ExtractPipeline.run(spark, s"$tmp/pages", s"$tmp/out", buckets = buckets)
    assert(res.rowsProcessed == rows)
    val extracted = spark.read.parquet(s"$tmp/out/extracted")
    assert(extracted.count() == rows)
    val truth = spark.read.parquet(s"$tmp/pages").select($"url", $"text".as("expected"))
    val joined = extracted.join(broadcast(truth), Seq("url"), "full_outer")
    val bad = joined.filter(!($"text" <=> $"expected") || !$"ok").count()
    assert(bad == 0, s"$bad rows mismatch ground truth")
  }

  test("pipeline equals sequential engine per url (shuffle invariance)") {
    import spark.implicits._
    val sample = spark.read.parquet(s"$tmp/pages")
      .select($"url", $"html").as[(String, Array[Byte])]
      .collect().take(40)
    val viaPipeline = spark.read.parquet(s"$tmp/out/extracted")
      .select($"url", $"text", $"char_count").as[(String, String, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    sample.foreach { case (url, html) =>
      val seq = ExtractPipeline.parseOne(url, html)
      val (pText, pChars) = viaPipeline(url)
      assert(seq.text == pText && seq.char_count == pChars, s"mismatch at $url")
    }
  }

  test("extracted rows carry spans, charset, and a quirks-page parses") {
    import spark.implicits._
    val one = spark.read.parquet(s"$tmp/out/extracted").filter($"url".endsWith("/doc/8")).head()
    assert(one.getAs[scala.collection.Seq[_]]("spans").nonEmpty)
    assert(one.getAs[String]("detected_charset") == "utf-8")
    val errs = spark.read.parquet(s"$tmp/out/extracted").agg(sum(size($"errors"))).head().getLong(0)
    // hazard pages produce parse errors (foster parenting, quirks) but all rows stay ok
    assert(errs > 0)
  }

  test("metrics table sums to input rows and marks all buckets") {
    import spark.implicits._
    val m = spark.read.parquet(s"$tmp/out/metrics")
    assert(m.agg(sum($"rows")).head().getLong(0) == rows)
    assert(m.select($"bucket").distinct().count() == buckets.toLong)
    assert(m.filter($"failed" > 0).count() == 0)
  }

  test("rerun is a no-op (resume from checkpoint)") {
    val res = ExtractPipeline.run(spark, s"$tmp/pages", s"$tmp/out", buckets = buckets)
    assert(res.pendingBuckets == 0 && res.rowsProcessed == 0)
  }

  test("partial checkpoint resumes only pending buckets") {
    import spark.implicits._
    val out2 = s"$tmp/out2"
    // pre-mark half the buckets done at epoch 0 with fake metrics
    val fake = (0 until buckets / 2).map(b =>
      BucketMetrics(0, b, buckets, 0, 0, 0, 0, 0, 0, new java.sql.Timestamp(0)))
    spark.createDataset(fake).write.mode("overwrite").parquet(s"$out2/metrics")
    val res = ExtractPipeline.run(spark, s"$tmp/pages", out2, buckets = buckets)
    assert(res.pendingBuckets == buckets / 2)
    val extracted = spark.read.parquet(s"$out2/extracted")
    val seen = extracted.select($"bucket").distinct().as[Int].collect().toSet
    assert(seen.forall(_ >= buckets / 2), s"processed done buckets: $seen")
    val m2 = spark.read.parquet(s"$out2/metrics")
    assert(m2.select($"bucket").distinct().count() == buckets.toLong)
  }

  test("empty buckets converge: tiny input at a wide layout still finishes") {
    val out3 = s"$tmp/out3"
    // 5 rows over 64 buckets: most buckets receive zero rows, and every
    // pending bucket must STILL be marked done or resume spins forever
    SynthCorpusJob.write(spark, 5, s"$tmp/pages5", partitions = 1)
    val r1 = ExtractPipeline.run(spark, s"$tmp/pages5", out3, buckets = 64)
    assert(r1.pendingBuckets == 64 && r1.rowsProcessed == 5L)
    val r2 = ExtractPipeline.run(spark, s"$tmp/pages5", out3, buckets = 64)
    assert(r2.pendingBuckets == 0 && r2.rowsProcessed == 0L,
      s"resume did not converge: $r2")
  }

  test("resume refuses a different bucket layout for the same epoch") {
    val out4 = s"$tmp/out4"
    ExtractPipeline.run(spark, s"$tmp/pages5", out4, buckets = 16)
    intercept[IllegalArgumentException] {
      ExtractPipeline.run(spark, s"$tmp/pages5", out4, buckets = 32)
    }
  }

  test("mixed-media corpus: PDFs and HTML route to the right leg in one job") {
    import spark.implicits._
    val out3 = s"$tmp/outmixed"
    // half the pages re-encoded as PDFs of the same text, half stay HTML
    val mixed = spark.read.parquet(s"$tmp/pages")
      .as[PageRow]
      .map { r =>
        val id = r.url.substring(r.url.lastIndexOf('/') + 1).toLong
        if (id % 2 == 0)
          r.copy(html = graft.pdfx.MiniPdf.build(
            graft.pdfx.MiniPdf.wrap(r.text), compress = id % 4 == 0))
        else r
      }
    mixed.write.mode("overwrite").parquet(s"$tmp/pagesmixed")
    val res = ExtractPipeline.run(spark, s"$tmp/pagesmixed", out3, buckets = 8)
    assert(res.rowsProcessed == rows)
    val extracted = spark.read.parquet(s"$out3/extracted")
    assert(extracted.filter($"detected_charset" === "pdf").count() == rows / 2)
    // the PDF leg's text must equal ground truth modulo the line wrapping
    val truth = spark.read.parquet(s"$tmp/pages").select($"url", $"text".as("expected"))
    // ground truth itself contains the title separator newline: compare
    // newline-normalized on BOTH sides (the PDF leg wraps lines at words)
    val bad = extracted.join(broadcast(truth), Seq("url"))
      .filter(!(regexp_replace($"text", "\n", " ") <=> regexp_replace($"expected", "\n", " ")) || !$"ok")
      .count()
    assert(bad == 0, s"$bad mixed-media rows mismatch ground truth")
  }

  test("heavy host spreads across multiple buckets (salting)") {
    import spark.implicits._
    val b = spark.read.parquet(s"$tmp/pages")
      .withColumn("bucket", ExtractPipeline.bucketCol(col("url"), buckets, 16, 0))
      .filter($"url".contains(SynthCorpus.heavyHost))
      .select($"bucket").distinct().count()
    assert(b > 4, s"heavy host concentrated in $b buckets")
  }
}
