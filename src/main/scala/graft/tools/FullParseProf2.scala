package graft.tools
/** Engine-reuse single-core profile (the pipeline's actual per-partition shape). */
object FullParseProf2 {
  def main(args: Array[String]): Unit = {
    import graft.htmlx._
    import graft.extract._
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/HtmlParserSharp/SampleData/test.html"))
    val html = HtmlParser.decodeUtf8(bytes)
    val engine = new HtmlParser.Engine
    for (_ <- 1 to 100) { val r = engine.parse(html); Extractor.extract(r.doc) }
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      for (_ <- 1 to 300) { val r = engine.parse(html); Extractor.extract(r.doc) }
      val dt = (System.nanoTime()-t0)/1e9
      println(f"rep$rep parse+extract(reuse): ${dt*1000/300}%.2f ms (${bytes.length*300/dt/1e6}%.1f MB/s)")
    }
  }
}
