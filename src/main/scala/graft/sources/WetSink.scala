package graft.sources

import org.apache.spark.sql.DataFrame

/** WET sink: write extracted text as Common-Crawl-style `.warc.wet.gz`
  * segments (WARC/1.0 conversion records, member-per-record gzip) — the
  * standard interchange artifact downstream text pipelines consume.
  *
  * One segment file per partition, named by partition id, streamed
  * record-by-record through the task's Hadoop output stream (no
  * per-partition buffering of the whole segment). Task retries overwrite
  * their own partition file, so the output is idempotent at the file
  * level; pair with the pipeline's bucket commit gate for exactly-once
  * accounting.
  *
  * WARC-Date is formatted from the raw Timestamp via `toInstant` +
  * ISO_INSTANT, truncated to seconds — pinned to UTC regardless of
  * `spark.sql.session.timeZone` (a string CAST renders session-local
  * wall-clock time falsely labeled Z — ADVICE r03 #2). Each per-record
  * GZIPOutputStream is `close()`d through a close-shield (the underlying
  * FS stream stays open), releasing the native Deflater deterministically
  * instead of leaking it until GC (ADVICE r03 #3). */
object WetSink {

  private val epochIso = "1970-01-01T00:00:00Z"

  def write(extracted: DataFrame, outDir: String,
            urlCol: String = "url", tsCol: String = "warc_ts",
            textCol: String = "text"): Long = {
    val spark = extracted.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = extracted
      .selectExpr(urlCol, s"CAST($tsCol AS TIMESTAMP)", textCol)
      .as[(String, java.sql.Timestamp, String)]
    val counts = rows.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = new org.apache.hadoop.fs.Path(f"$outDir/part-$pid%05d.warc.wet.gz")
      // write to an attempt-suffixed temp and rename on success: a direct
      // create(overwrite) on the final name lets a speculative or zombie
      // attempt truncate a completed segment mid-read; with the rename,
      // every observable final file is complete (last completer wins)
      val tmp = new org.apache.hadoop.fs.Path(
        f"$outDir/.part-$pid%05d.warc.wet.gz.attempt-${tc.taskAttemptId()}.tmp")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(tmp, true)
      // keeps the FS stream open across per-record gzip members while
      // letting each member's close() end its native Deflater
      val shield = new java.io.FilterOutputStream(out) {
        override def close(): Unit = flush()
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          this.out.write(b, off, len)
      }
      var n = 0L
      var ok = false
      try {
        while (it.hasNext) {
          val (url, ts, text) = it.next()
          val iso = if (ts == null) epochIso
                    else java.time.format.DateTimeFormatter.ISO_INSTANT.format(
                      ts.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
          val rec = Warc.buildConversion(if (url == null) "" else url, iso,
            if (text == null) "" else text, seq = (pid.toLong << 32) | n)
          val gz = new java.util.zip.GZIPOutputStream(shield)
          gz.write(rec); gz.close()
          n += 1
        }
        ok = true
      } finally {
        out.close()
        if (ok) {
          fs.delete(path, false)
          // a false rename (racing attempt won, quota, lease) must FAIL
          // the task — reporting n records while no final file exists
          // would be a silent data hole; the orphan tmp is removed first
          if (!fs.rename(tmp, path)) {
            fs.delete(tmp, false)
            throw new java.io.IOException(s"rename $tmp -> $path failed")
          }
        } else fs.delete(tmp, false)
      }
      Iterator.single(n)
    }
    counts.reduce(_ + _)
  }
}
