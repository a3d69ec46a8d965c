package graft.tools

import graft.pipeline.{ExtractPipeline, SparkEnv}

/** End-to-end pipeline timing: read → salt → parse → partitioned write →
  * metrics commit (the full production job incl. IO, unlike Bench's
  * count-only extraction). usage: PipelineBench <pagesDir> [cpus] */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val pages = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 16
    val spark = SparkEnv.session(s"local[$cpus]", "graft-pipeline-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft-pipe-bench").toString
    val t0 = System.nanoTime()
    val res = ExtractPipeline.run(spark, pages, out, buckets = 64)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"rows":${res.rowsProcessed},"sec":$sec%.2f,"docs_per_sec":${res.rowsProcessed / sec}%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
