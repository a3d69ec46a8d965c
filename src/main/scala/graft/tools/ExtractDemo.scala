package graft.tools

import graft.htmlx._
import graft.extract._

/** CLI surface for the extraction layer: parse + extract + print. */
object ExtractDemo {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val parsed = HtmlParser.parseBytes(bytes)
    val ex = Extractor.extract(parsed.doc)
    println(s"blocks=${ex.blockCount} content=${ex.contentBlockCount} chars=${ex.charCount} nodes=${ex.nodeCount}")
    ex.spans.foreach(s => println(s"  span [${s.start},${s.end}) ${s.path}"))
    println("--- text ---")
    println(ex.text)
    if (args.contains("--blocks")) {
      println("--- all blocks ---")
      Extractor.segment(parsed.doc).foreach { b =>
        println(f"w=${b.words}%3d ld=${b.linkDensity}%.2f h=${b.isHeading} ${b.path}  ${b.text.take(60)}")
      }
    }
  }
}
