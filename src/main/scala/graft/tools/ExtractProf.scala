package graft.tools

import graft.htmlx._
import graft.extract._

/** Extractor stage split on the reference sample page. */
object ExtractProf {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/HtmlParserSharp/SampleData/test.html"))
    val html = HtmlParser.decodeUtf8(bytes)
    val engine = new HtmlParser.Engine
    val doc = engine.parse(html).doc

    def bestOf(label: String, reps: Int, rounds: Int)(f: => Unit): Unit = {
      for (_ <- 1 to reps * 2) f
      var best = Double.MaxValue
      for (_ <- 1 to rounds) {
        val t0 = System.nanoTime()
        for (_ <- 1 to reps) f
        val s = (System.nanoTime() - t0) / 1e9 / reps
        if (s < best) best = s
      }
      println(f"$label%-22s ${best * 1e6}%9.1f us (best of $rounds x $reps)")
    }

    bestOf("segment", 200, 5)(Extractor.segment(doc))
    val blocks = Extractor.segment(doc)
    bestOf("classify", 200, 5)(Extractor.classify(blocks))
    bestOf("full extract", 200, 5)(Extractor.extract(doc))
    println(s"blocks=${blocks.length}")
  }
}
