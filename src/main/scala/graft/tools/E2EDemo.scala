package graft.tools

import org.apache.spark.sql.functions._

/** Smoke/triage main for the composed end-to-end job: run it at one SF,
  * print stage survival counts and sample rows — the quick look before the
  * DuckDB oracle pins every byte. Usage: E2EDemo [sfDir] [lmCut]. */
object E2EDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val lmCut = if (args.length > 1) args(1).toLong
                else graft.pipeline.E2EPipeline.defaultLmCut
    val spark = graft.pipeline.SparkEnv.session("local[8]", "graft-e2e-demo", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val out = graft.pipeline.E2EPipeline.verified(spark, sfDir, lmCut)
    if (args.length > 2) // optional parquet dump for oracle development
      out.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(args(2))
    val rows = out.orderBy("doc_id").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    println(f"[e2e] input docs: $docs, survivors: ${rows.length}, $sec%.1f s")
    // head + tail samples (disjoint when the survivor set is tiny)
    (rows.take(3) ++ rows.drop(3).takeRight(2)).foreach { r =>
      println(s"[e2e] id=${r.getLong(0)} tokens=${r.getLong(2)} chunks=${r.getLong(3)} " +
        s"start=${r.getLong(4)} text=${r.getString(1).replace("\n", "\\n").take(120)}")
    }
    // planted near-dup sanity: dup copies (id%101 in {99,100} with an
    // eligible base) must be ABSENT when the base survived
    val planted = rows.filter(r => r.getLong(0) % 101 == 99 || r.getLong(0) % 101 == 100)
    println(s"[e2e] surviving planted-copy ids: ${planted.map(_.getLong(0)).mkString(",")}")
    spark.stop()
  }
}
