package graft.tools
import graft.pipeline.SynthCorpus
import graft.htmlx.HtmlParser
import graft.extract.Extractor
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM thread-scaling probe: parse+extract N synthetic pages with T
  * threads, no Spark. Distinguishes machine limits from Spark overheads. */
object ThreadScaling {
  def run(threads: Int, docs: Long): Double = {
    val counter = new AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      new Thread(() => {
        var i = tid.toLong
        while (i < docs) {
          val text = SynthCorpus.syntheticText(i)
          val html = SynthCorpus.pageBytes(i, text)
          val parsed = HtmlParser.parseBytes(html)
          val ex = Extractor.extract(parsed.doc)
          counter.addAndGet(ex.charCount.toLong)
          i += threads
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    docs / sec
  }
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 100000L
    run(4, 20000) // warmup
    for (t <- Seq(1, 2, 4, 6, 8, 12, 16)) {
      val dps = run(t, docs)
      println(f"threads=$t%2d docs=$docs docs_per_sec=$dps%.0f")
    }
  }
}
