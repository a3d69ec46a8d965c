package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.pipeline.SparkEnv

/** Stage-by-stage profile of the dedup_minhash query (BENCH outlier). */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkEnv.session("local[8]", "minhash-prof", 8)
    implicit val s: SparkSession = spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    // warm
    Dedup.minhashDedup(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", threshold = 0.5).count()

    for (_ <- 1 to 2) {
      time("shingles-explode")(docs.select(col("doc_id").as("id"),
        explode(Dedup.shingles(col("text"), 3)).as("sh")).count())
      time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3).count())
      time("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
      time("full")(Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5).count())
    }
    spark.stop()
  }
}
