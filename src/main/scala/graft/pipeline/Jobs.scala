package graft.pipeline

import org.apache.spark.sql.SparkSession

object SparkEnv {
  /** Session defaults per SURVEY.md §4.2: AQE on, shuffle partitions sized
    * for local[32] (not the 200 default). */
  def session(master: String = null, appName: String = "graft",
              shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // CPU-scaling measurements must not bottleneck on the sandbox's slow
      // /tmp overlay; a real cluster's shuffle bandwidth scales with nodes.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
    val withMaster = if (master != null) b.master(master) else b
    withMaster.getOrCreate()
  }
}

/** Writes the deterministic synthetic page table (FIXTURES.md §1).
  * usage: SynthCorpusJob <rows> <outPath> [partitions]
  */
object SynthCorpusJob {
  def write(spark: SparkSession, rows: Long, outPath: String, partitions: Int = 32,
            idOffset: Long = 0): Unit = {
    import spark.implicits._
    spark.range(idOffset, idOffset + rows, 1, partitions)
      .map(i => SynthCorpus.pageRow(i))
      .write.mode("overwrite").parquet(outPath)
  }

  def main(args: Array[String]): Unit = {
    val rows = args(0).toLong
    val out = args(1)
    val parts = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkEnv.session(s"local[$cpus]", "graft-synth", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    SynthCorpusJob.write(spark, rows, out, parts)
    spark.stop()
  }
}

/** The extraction job (spark-submit main).
  * usage: ExtractJob <inputParquet> <outputDir> [buckets] [epoch]
  */
object ExtractJob {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val output = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 64
    val epoch = if (args.length > 3) args(3).toInt else 0
    // under spark-submit the cluster manager supplies the master; the env
    // var forces a local master only for sandbox runs
    val master = sys.env.get("SPARK_GRAFT_CPUS").map(c => s"local[$c]").orNull
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).toInt
    val spark = SparkEnv.session(master, "graft-extract", shuffleParts)
    spark.sparkContext.setLogLevel("WARN")
    val decodeLadder = args.length > 4 && args(4).toBoolean
    val res = ExtractPipeline.run(spark, input, output, buckets = buckets,
      epoch = epoch, decodeLadder = decodeLadder)
    println(s"""{"pendingBuckets":${res.pendingBuckets},"rowsProcessed":${res.rowsProcessed}}""")
    spark.stop()
  }
}
