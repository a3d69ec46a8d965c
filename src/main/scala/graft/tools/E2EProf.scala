package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}
import graft.pipeline.{E2EPipeline, SparkEnv}
import graft.sources.{WarcSource, WetSink}

/** Per-stage wall-clock triage for the composed e2e job — replicates
  * [[E2EPipeline.verified]] with timers at every blocking action so a
  * composed-job regression can be localized to a stage instead of
  * adjudicated by total. Usage:
  * {{{ java -cp ... graft.tools.E2EProf /root/testdata/sf0.1 [cpus] }}} */
object E2EProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkEnv.session(s"local[$cpus]", "graft-e2e-prof", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e2eprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the engine + query shapes once (cold JIT would dominate)
    E2EPipeline.verified(spark, "/root/testdata/sf0.001").count()
    println("[e2eprof] warmup done")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = E2EPipeline.plantNearDups(docs)
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_e2e_${math.abs(sfDir.hashCode)}_${E2EPipeline.fixtureVersion}"
    timed("warc fixtures")(E2EPipeline.writeWarcSegments(spark, planted, s"$work/warc"))
    val prior = planted.filter(col("doc_id") % 13 === 0)
      .select(E2EPipeline.extractedTextOf(col("doc_id"), col("text")).as("text"))
    var streamRows = -1L
    var dedupRows = -1L
    val surv = timed("survivors (all gates)") {
      E2EPipeline.survivors(spark, s"$work/warc", E2EPipeline.robotsTable(spark),
        docs.select(col("doc_id"), col("source")), E2EPipeline.defaultLmCut,
        materialize = df => timed("  extract boundary") {
          val s = df.localCheckpoint(true); streamRows = s.count(); s
        },
        materializeDedup = df => timed("  line-dedup boundary") {
          val s = df.localCheckpoint(true); dedupRows = s.count(); s
        },
        blocklist = Some(E2EPipeline.blocklistTable(spark)),
        priorSnapshot = Some(prior),
        keepLangs = Some(Seq("en"))).localCheckpoint(true)
    }
    val n = surv.count()
    println(s"[e2eprof] stream=$streamRows postDedup=$dedupRows survivors=$n")
    val plan = timed("chunk plan")(
      Packing.chunkPlan(surv, "doc_id",
          TextAnalysis.tokenCount(col("text")), tokensPerChunk = 64)(spark)
        .withColumnRenamed("id", "doc_id").localCheckpoint(true))
    val wetDir = new org.apache.hadoop.fs.Path(s"$work/wet")
    val fs = wetDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(wetDir, true)
    timed("wet write")(WetSink.write(
      surv.withColumn("warc_ts", lit(null).cast("timestamp")), s"$work/wet"))
    val wet = timed("wet read")(WarcSource.readWet(spark, s"$work/wet")
      .withColumn("doc_id", regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .select(col("doc_id"), col("text")).localCheckpoint(true))
    val out = timed("final join")(plan.join(wet, Seq("doc_id")).count())
    println(s"[e2eprof] output rows=$out")
    spark.stop()
  }
}
