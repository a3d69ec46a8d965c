package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private val pages = Seq(
    ("https://a.example/one", "2025-01-01T00:00:00Z", "<html><body><p>alpha</p>"),
    ("https://b.example/two", "2025-01-02T10:30:00Z", "<html><body><p>beta β UTF-8</p>"),
    ("https://c.example/three", "2025-01-03T23:59:59Z", ""))

  private def recs = pages.map { case (u, d, h) => (u, d, h.getBytes("UTF-8")) }

  test("plain roundtrip: responses come back byte-identical, warcinfo skipped") {
    val file = Warc.buildFile(recs, gzipPerRecord = false)
    val rs = Warc.records(file).toSeq
    assert(rs.map(_.warcType) == Seq("warcinfo", "response", "response", "response"))
    val resp = rs.filter(_.warcType == "response")
    assert(resp.map(_.targetUri) == pages.map(_._1))
    assert(resp.map(_.date) == pages.map(_._2))
    assert(resp.map(r => new String(Warc.htmlPayload(r), "UTF-8")) == pages.map(_._3))
  }

  test("gzip member-per-record roundtrip") {
    val file = Warc.buildFile(recs, gzipPerRecord = true)
    assert((file(0) & 0xFF) == 0x1F && (file(1) & 0xFF) == 0x8B)
    val resp = Warc.records(file).filter(_.warcType == "response").toSeq
    assert(resp.map(r => new String(Warc.htmlPayload(r), "UTF-8")) == pages.map(_._3))
  }

  test("payload without an embedded HTTP head passes through whole") {
    val r = WarcRecord("resource", "u", "d", "just bytes".getBytes("UTF-8"))
    assert(new String(Warc.htmlPayload(r), "UTF-8") == "just bytes")
  }

  test("corrupt record in the middle: resync recovers the rest") {
    val good = Warc.buildFile(recs)
    val garbage = "WARC/1.0\r\nWARC-Type: response\r\nbroken header line\r\nContent-Length: oops\r\n\r\n".getBytes("ISO-8859-1")
    val tail = Warc.buildResponse("https://d.example/four", "2025-01-04T00:00:00Z",
      "<p>recovered</p>".getBytes("UTF-8"))
    val file = good ++ garbage ++ tail
    val resp = Warc.records(file).filter(_.warcType == "response").toSeq
    assert(resp.map(_.targetUri) ==
      pages.map(_._1) :+ "https://d.example/four")
  }

  test("truncated payload: earlier records survive, iterator ends cleanly") {
    val file = Warc.buildFile(recs)
    val cut = file.take(file.length - 30)
    val resp = Warc.records(cut).filter(_.warcType == "response").toSeq
    assert(resp.size == pages.size - 1 || resp.size == pages.size)
    assert(resp.head.targetUri == pages.head._1)
  }

  test("random garbage never throws") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      Warc.records(junk).foreach(_ => ())
    }
  }

  test("WET conversion records roundtrip; WetSink writes readable segments") {
    // writer-level roundtrip
    val wet = Warc.buildWetFile(Seq(
      ("https://a.example/1", "2025-01-01T00:00:00Z", "first text β"),
      ("https://a.example/2", "2025-01-02T00:00:00Z", "")), gzipPerRecord = true)
    val convs = Warc.records(wet).filter(_.warcType == "conversion").toSeq
    assert(convs.map(r => new String(r.payload, "UTF-8")) == Seq("first text β", ""))
    assert(convs.map(_.targetUri) == Seq("https://a.example/1", "https://a.example/2"))

    // Spark sink roundtrip
    val spark = graft.pipeline.SparkEnv.session("local[2]", "wet-spec", 2)
    try {
      import spark.implicits._
      val df = (0 until 30).map(i =>
        (s"https://h$i.example/doc/$i", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
          s"text body number $i")).toDF("url", "warc_ts", "text").repartition(3)
      val dir = java.nio.file.Files.createTempDirectory("wetsink").toString
      val n = WetSink.write(df, dir)
      assert(n == 30)
      val back = WarcSource.read(spark, dir + "/*.warc.wet.gz")
      // conversion records have no embedded HTTP head: payload = text,
      // but WarcSource keeps only warcType == "response"; read raw instead
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
      assert(files.length == 3)
      val texts = files.flatMap { f =>
        Warc.records(java.nio.file.Files.readAllBytes(f.toPath))
          .filter(_.warcType == "conversion")
          .map(r => new String(r.payload, "UTF-8"))
      }.toSet
      assert(texts == (0 until 30).map(i => s"text body number $i").toSet)
      assert(back.count() == 0) // responses only, by design
    } finally spark.stop()
  }

  test("warc file through the full salted extraction pipeline, byte-identical") {
    import graft.pipeline.{ExtractPipeline, SynthCorpus}
    val spark = graft.pipeline.SparkEnv.session("local[2]", "warc-pipe", 2)
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val synth = (0L until 40L).map { id =>
        val text = SynthCorpus.syntheticText(id)
        (SynthCorpus.url(id), "2025-01-01T00:00:00Z", SynthCorpus.pageBytes(id, text))
      }
      val dir = java.nio.file.Files.createTempDirectory("warcpipe")
      // two segment files, mixed compression
      java.nio.file.Files.write(dir.resolve("seg-0.warc.gz"),
        Warc.buildFile(synth.take(20), gzipPerRecord = true))
      java.nio.file.Files.write(dir.resolve("seg-1.warc"),
        Warc.buildFile(synth.drop(20)))
      val pages = WarcSource.read(spark, dir.toString + "/*")
        .withColumn("bucket", ExtractPipeline.bucketCol(col("url"), 32, 16, 0))
        .repartition(8, col("bucket"))
      val out = ExtractPipeline.parseStage(pages)(spark)
        .select($"url", $"text").as[(String, String)].collect().toMap
      assert(out.size == 40)
      for (id <- 0L until 40L) {
        val expected = SynthCorpus.expectedExtract(id, SynthCorpus.syntheticText(id))
        assert(out(SynthCorpus.url(id)) == expected, s"doc $id text mismatch")
      }
    } finally spark.stop()
  }

  test("streaming source: nested dirs, hidden files skipped, early stop") {
    val spark = graft.pipeline.SparkEnv.session("local[2]", "warc-stream", 2)
    try {
      val dir = java.nio.file.Files.createTempDirectory("warcwalk")
      val sub = java.nio.file.Files.createDirectory(dir.resolve("crawl=0"))
      val many = (0 until 500).map(i =>
        (s"https://w.example/p/$i", "2025-02-03T04:05:06Z",
          s"<html><body><p>page $i</p>".getBytes("UTF-8")))
      java.nio.file.Files.write(sub.resolve("seg-a.warc.gz"),
        Warc.buildFile(many.take(250), gzipPerRecord = true))
      java.nio.file.Files.write(sub.resolve("seg-b.warc"),
        Warc.buildFile(many.drop(250)))
      java.nio.file.Files.write(sub.resolve("_SUCCESS"), Array.empty[Byte])
      java.nio.file.Files.write(sub.resolve(".hidden.warc"),
        "not a warc".getBytes("UTF-8"))
      val segs = WarcSource.listSegments(spark, dir.toString)
      assert(segs.size == 2 && segs.forall(_.contains("seg-")),
        s"directory walk wrong: $segs")
      assert(WarcSource.read(spark, dir.toString).count() == 500)
      // early termination closes mid-file without error (limit < file rows)
      assert(WarcSource.read(spark, dir.toString).limit(7).collect().length == 7)
    } finally spark.stop()
  }

  test("over-long header line: value truncated, header stream stays aligned") {
    // a >64 KiB WARC-Target-URI: the tail of the line must be drained,
    // not re-parsed as further header lines — and the NEXT record must
    // still come through intact
    val longUrl = "https://long.example/" + ("x" * (Warc.MaxHeaderBytes + 500))
    val file = Warc.buildFile(Seq(
      (longUrl, "2025-01-01T00:00:00Z", "<p>one".getBytes("UTF-8")),
      ("https://ok.example/", "2025-01-02T00:00:00Z", "<p>two".getBytes("UTF-8"))))
    val resp = Warc.records(file).filter(_.warcType == "response").toSeq
    assert(resp.length == 2)
    assert(resp(0).targetUri.length <= Warc.MaxHeaderBytes)
    assert(resp(0).targetUri.startsWith("https://long.example/"))
    assert(new String(Warc.htmlPayload(resp(0)), "UTF-8") == "<p>one")
    assert(resp(1).targetUri == "https://ok.example/")
    assert(new String(Warc.htmlPayload(resp(1)), "UTF-8") == "<p>two")
  }

  test("missing input path fails fast instead of yielding empty output") {
    val spark = graft.pipeline.SparkEnv.session("local[2]", "warc-spec-miss", 2)
    try {
      intercept[java.io.FileNotFoundException] {
        WarcSource.read(spark, "/nonexistent-graft-path/segments")
      }
      intercept[java.io.FileNotFoundException] {
        WarcSource.read(spark, "/nonexistent-graft-path/*.warc.gz")
      }
    } finally spark.stop()
  }

  test("Spark read: warc.gz file to (url, warc_ts, html) rows") {
    val spark = graft.pipeline.SparkEnv.session("local[2]", "warc-spec", 2)
    try {
      val dir = java.nio.file.Files.createTempDirectory("warcspec")
      java.nio.file.Files.write(dir.resolve("seg-00000.warc.gz"),
        Warc.buildFile(recs, gzipPerRecord = true))
      val rows = WarcSource.read(spark, dir.toString + "/*.warc.gz")
        .orderBy("url").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getString(0)).toSeq == pages.map(_._1).sorted)
      assert(new String(rows(0).getAs[Array[Byte]]("html"), "UTF-8") == "<html><body><p>alpha</p>")
      assert(rows(0).getTimestamp(1) != null)
    } finally spark.stop()
  }
}
