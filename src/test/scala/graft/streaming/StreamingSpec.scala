package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.pipeline.{SparkEnv, SynthCorpusJob}

/** Streaming face: same results as the batch pipeline, exactly-once across
  * restarts via the streaming checkpoint. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkEnv.session("local[4]", "graft-stream-test", shufflePartitions = 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("streaming extraction matches batch output and is exactly-once on restart") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream").toString
    SynthCorpusJob.write(spark, 120, s"$tmp/pages", partitions = 2)

    val q = StreamingExtract.run(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt", buckets = 8)
    q.awaitTermination()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 120)
    // byte-identity vs ground truth, through the streaming path
    val truth = spark.read.parquet(s"$tmp/pages").select($"url", $"text".as("expected"))
    val bad = out.join(truth, Seq("url")).filter(!($"text" <=> $"expected")).count()
    assert(bad == 0)

    // restart with no new data → no duplicates (checkpoint tracks progress)
    val q2 = StreamingExtract.run(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt", buckets = 8)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == 120)

    // new files arrive → only the delta is processed
    SynthCorpusJob.write(spark, 40, s"$tmp/pages2", partitions = 1)
    val fs = new java.io.File(s"$tmp/pages2").listFiles().filter(_.getName.endsWith(".parquet"))
    fs.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$tmp/pages/delta$i.parquet"))
    }
    val q3 = StreamingExtract.run(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt", buckets = 8)
    q3.awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == 160)
  }

  test("streaming WARC watch-folder: segments extracted exactly-once across restarts") {
    import spark.implicits._
    import graft.pipeline.SynthCorpus
    import graft.sources.Warc
    val tmp = Files.createTempDirectory("graft-warc-stream").toString
    new java.io.File(s"$tmp/in").mkdirs()
    def segment(ids: Range, gz: Boolean): Array[Byte] =
      Warc.buildFile(ids.map { i =>
        (SynthCorpus.url(i.toLong), "2025-01-01T00:00:00Z",
          SynthCorpus.pageBytes(i.toLong, SynthCorpus.syntheticText(i.toLong)))
      }, gzipPerRecord = gz)
    Files.write(java.nio.file.Paths.get(s"$tmp/in/seg-0.warc.gz"), segment(0 until 25, gz = true))
    Files.write(java.nio.file.Paths.get(s"$tmp/in/seg-1.warc"), segment(25 until 50, gz = false))

    val q = StreamingExtract.runFromWarc(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ck", buckets = 8)
    q.awaitTermination()
    val out = spark.read.parquet(s"$tmp/out").select($"url", $"text").as[(String, String)].collect().toMap
    assert(out.size == 50)
    assert(out(SynthCorpus.url(7L)) ==
      SynthCorpus.expectedExtract(7L, SynthCorpus.syntheticText(7L)))

    // restart with no new segments → no duplicates
    StreamingExtract.runFromWarc(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ck", buckets = 8).awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == 50)

    // a late-arriving segment is picked up alone
    Files.write(java.nio.file.Paths.get(s"$tmp/in/seg-2.warc.gz"), segment(50 until 60, gz = true))
    StreamingExtract.runFromWarc(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ck", buckets = 8).awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == 60)
  }

  test("stateful first-seen dedup suppresses recrawled content across restarts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream3").toString
    SynthCorpusJob.write(spark, 60, s"$tmp/pages", partitions = 2)

    val q = StreamingExtract.firstSeenDedupOnce(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination()
    val firstRun = spark.read.parquet(s"$tmp/out")
    val distinctDigests = spark.read.parquet(s"$tmp/pages")
      .select(xxhash64($"html"), length($"html")).distinct().count()
    assert(firstRun.count() == distinctDigests)

    // recrawl: the SAME 60 pages arrive again as new files — the state store
    // (recovered from the checkpoint) must suppress every one of them
    val fs = new java.io.File(s"$tmp/pages").listFiles().filter(_.getName.endsWith(".parquet"))
    fs.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$tmp/pages/recrawl$i.parquet"))
    }
    val q2 = StreamingExtract.firstSeenDedupOnce(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == distinctDigests,
      "recrawled identical content must not be re-emitted")

    // genuinely new content still flows through
    SynthCorpusJob.write(spark, 20, s"$tmp/newpages", partitions = 1, idOffset = 1000)
    new java.io.File(s"$tmp/newpages").listFiles().filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$tmp/pages/new$i.parquet"))
      }
    val q3 = StreamingExtract.firstSeenDedupOnce(spark, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt")
    q3.awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == distinctDigests + 20)
  }

  test("watermarked windowed host-rate aggregation") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream2").toString
    SynthCorpusJob.write(spark, 100, s"$tmp/pages", partitions = 2)
    val q = StreamingExtract.hostRateOnce(spark, s"$tmp/pages", s"$tmp/ckpt", "host_rate")
    q.awaitTermination()
    val res = spark.sql("SELECT sum(pages) FROM host_rate").head().getLong(0)
    assert(res == 100)
    val heavy = spark.sql(
      s"SELECT sum(pages) FROM host_rate WHERE host = '${graft.pipeline.SynthCorpus.heavyHost}'")
      .head().getLong(0)
    assert(heavy == 30) // 30% heavy-host skew by construction
  }
}
