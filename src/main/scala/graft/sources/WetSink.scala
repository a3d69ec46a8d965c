package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** WET sink: write extracted text as Common-Crawl-style `.warc.wet.gz`
  * segments (WARC/1.0 conversion records, member-per-record gzip) — the
  * standard interchange artifact downstream text pipelines consume.
  *
  * One segment file per partition, named by partition id, streamed
  * record-by-record through the task's Hadoop output stream (no
  * per-partition buffering of the whole segment). Task retries overwrite
  * their own partition file, so the output is idempotent at the file
  * level; pair with the pipeline's bucket commit gate for exactly-once
  * accounting. */
object WetSink {

  def write(extracted: DataFrame, outDir: String,
            urlCol: String = "url", tsCol: String = "warc_ts",
            textCol: String = "text"): Long = {
    val spark = extracted.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = extracted
      .selectExpr(urlCol, s"CAST($tsCol AS STRING)", textCol)
      .as[(String, String, String)]
    val counts = rows.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = new org.apache.hadoop.fs.Path(f"$outDir/part-$pid%05d.warc.wet.gz")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(path, true)
      var n = 0L
      try {
        while (it.hasNext) {
          val (url, ts, text) = it.next()
          val iso = if (ts == null) "2025-01-01T00:00:00Z"
                    else ts.replace(' ', 'T').takeWhile(_ != '.') + "Z"
          val rec = Warc.buildConversion(url, iso, if (text == null) "" else text)
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(rec); gz.finish()
          n += 1
        }
      } finally out.close()
      Iterator.single(n)
    }
    counts.reduce(_ + _)
  }
}
