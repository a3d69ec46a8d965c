package graft.tools

import graft.htmlx._
import graft.extract._

/** Stage cost split on the reference sample page: tokenizer-only vs full
  * parse vs parse+extract, deeply JIT-warmed, best-of reporting. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/HtmlParserSharp/SampleData/test.html"))
    val html = HtmlParser.decodeUtf8(bytes)
    val mb = bytes.length / 1e6

    def bestOf(label: String, reps: Int, rounds: Int)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to rounds) {
        val t0 = System.nanoTime()
        for (_ <- 1 to reps) f
        val s = (System.nanoTime() - t0) / 1e9 / reps
        if (s < best) best = s
      }
      println(f"$label%-28s ${best * 1000}%7.2f ms  ${mb / best}%6.1f MB/s (best of $rounds x $reps)")
    }

    val tok = new Tokenizer(new PerfProbe.NullHandler)
    val engine = new HtmlParser.Engine
    // deep warmup
    for (_ <- 1 to 500) { tok.tokenize(html); val r = engine.parse(html); Extractor.extract(r.doc) }

    bestOf("tokenize only", 100, 5)(tok.tokenize(html))
    bestOf("parse (tok+tree)", 100, 5)(engine.parse(html))
    bestOf("parse+extract", 100, 5) { val r = engine.parse(html); Extractor.extract(r.doc) }
  }
}
