package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractPipeline, SparkEnv, SynthCorpus}

/** Driver-run benchmark: one JSON line with per-query seconds plus the
  * extraction-throughput headline (docs/sec), the metric named by
  * BASELINE.json. Each query is warmed once at sf0.001 before timing so JIT
  * compilation does not pollute the measurement (see
  * .claude/skills/verify/SKILL.md — cold-JVM numbers are off by up to 80×).
  */
object Bench {

  /** Fixed-work single-thread calibration probe: 8e8 xorshift64* steps of
    * pure register arithmetic (no allocation, no memory traffic). Its wall
    * time depends only on how much CPU the sandbox actually grants this JVM,
    * so a reader can normalize grant drift out of the driver-side numbers:
    * if calib_sec is k× the pinned-run reference (BENCH/BASELINE.md), every
    * query time in the same JSON is inflated by roughly the same k. */
  def calibSec(): Double = {
    var x = 0x9e3779b97f4a7c15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < 800000000L) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (x == 42L) println(x) // defeat dead-code elimination
    sec
  }

  /** Materialize the deterministic corpus once (outside any timing). */
  def corpusPath(spark: SparkSession, nDocs: Long): String = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft-bench-corpus")
    val path = s"$base/pages-$nDocs"
    val p = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      import spark.implicits._
      spark.range(0, nDocs, 1, 64)
        .map(i => SynthCorpus.pageRow(i)).toDF()
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Timed region = the production job shape: parquet scan (pruned to
    * url+html) → salted repartition → mapPartitions parse+extract → count.
    * Corpus generation stays outside the timing. */
  def extractionBench(spark: SparkSession, nDocs: Long): (Double, Long) = {
    import spark.implicits._
    val path = corpusPath(spark, nDocs)
    val pages = spark.read.parquet(path)
      .select($"url", $"html")
      .filter($"html".isNotNull)
      .withColumn("bucket", ExtractPipeline.bucketCol($"url", 256, 16, 0))
      .repartition(spark.sparkContext.defaultParallelism * 4, $"bucket")
    val t0 = System.nanoTime()
    val n = ExtractPipeline.parseStage(pages)(spark)
      .filter($"ok").count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkEnv.session(s"local[$cpus]", "graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // ---- calibration probe (before any timed work; see calibSec scaladoc)
    val calibStart = calibSec()

    // ---- warmup: JIT the engine + every query shape at the smallest SF.
    // Falls back to the bench dir itself when the default small-SF layout
    // is absent (other machines): a silently skipped warmup would time
    // cold-JVM shapes — the exact 80× distortion it exists to prevent.
    extractionBench(spark, 2000)
    val warmDir = {
      val d = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    // optional comma-separated query filter (SPARK_GRAFT_ONLY=e2e_pipeline)
    // for targeted re-benching after a change to a composed job's stage
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    var warmFailed = 0
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => warmFailed += 1 }
    }
    if (warmFailed > 0)
      System.err.println(s"[bench] WARNING: $warmFailed warmup queries failed ($warmDir)")

    // ---- timed queries at the requested SF. A failed query must be
    // VISIBLE: its time-to-failure is not a timing, so it is excluded from
    // the queries map and reported in a failed list instead.
    var failed = List.empty[String]
    val results = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => failed ::= name; None }
    }

    // ---- extraction throughput headline (docs/sec at this parallelism)
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000").toLong
    extractionBench(spark, math.min(nDocs, 5000)) // warm the exact shape
    val (sec, n) = extractionBench(spark, nDocs)
    val docsPerSec = n / sec

    // ---- closing calibration probe (drift WITHIN the run is visible too)
    val calibEnd = calibSec()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum + sec
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","extract_docs":$n,"extract_sec":$sec%.3f,"docs_per_sec":$docsPerSec%.1f,"cpus":$cpus,"calib_sec":$calibStart%.3f,"calib_sec_end":$calibEnd%.3f}""")
    spark.stop()
  }
}

/** Standalone calibration probe (no Spark): prints Bench.calibSec() a few
  * times so the pinned single-core reference for BENCH/BASELINE.md can be
  * (re)measured: `taskset -c 0 java -cp ... graft.CalibProbe`. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    (1 to reps).foreach(_ => println(f"${Bench.calibSec()}%.3f"))
  }
}

/** Scaling evidence for the north rule (≥0.8 efficiency N→4N): run the same
  * extraction job at two parallelism levels; see BENCH/BASELINE.md.
  * usage: ScalingBench [nDocs]  (cores from SPARK_GRAFT_CPUS)
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 40000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkEnv.session(s"local[$cpus]", "graft-scaling", cpus)
    spark.sparkContext.setLogLevel("WARN")
    Bench.extractionBench(spark, 2000) // JIT warmup
    Bench.extractionBench(spark, math.min(nDocs, 10000)) // shape warmup
    val (sec, n) = Bench.extractionBench(spark, nDocs)
    println(f"""{"cpus":$cpus,"docs":$n,"sec":$sec%.3f,"docs_per_sec":${n / sec}%.1f}""")
    spark.stop()
  }
}
