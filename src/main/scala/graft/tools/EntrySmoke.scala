package graft.tools
import graft.pipeline.SparkEnv
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session("local[4]", "entry-smoke", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("entry rows: " + df.count())
    df.show(3, 60)
    spark.stop()
  }
}
