package graft.tools
object FullParseProf {
  def main(args: Array[String]): Unit = {
    import graft.htmlx._
    import graft.extract._
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/HtmlParserSharp/SampleData/test.html"))
    val html = HtmlParser.decodeUtf8(bytes)
    for (_ <- 1 to 50) { val r = HtmlParser.parseDocument(html); Extractor.extract(r.doc) }
    val t0 = System.nanoTime()
    for (_ <- 1 to 300) { val r = HtmlParser.parseDocument(html); Extractor.extract(r.doc) }
    println(f"parse+extract: ${(System.nanoTime()-t0)/1e6/300}%.2f ms (${bytes.length*300/((System.nanoTime()-t0)/1e9)/1e6}%.1f MB/s)")
  }
}
