package graft.tools

import graft.htmlx.HtmlParser
import graft.extract.Extractor
import java.nio.file.{Files, Paths}

/** Extraction debugging aid: dump every segmented block with its features
  * and the classifier verdict. Usage: BlockDump <file.html> [substring]. */
object BlockDump {
  def main(args: Array[String]): Unit = {
    val parsed = HtmlParser.parseBytes(Files.readAllBytes(Paths.get(args(0))))
    val blocks = Extractor.segment(parsed.doc)
    val verdict = Extractor.classify(blocks)
    val filter = if (args.length > 1) Some(args(1)) else None
    blocks.zipWithIndex.foreach { case (b, i) =>
      val show = filter.forall(f => b.text.contains(f) ||
        (i > 0 && blocks(i - 1).text.contains(f)) ||
        (i + 1 < blocks.length && blocks(i + 1).text.contains(f)))
      if (show) {
        val mark = if (verdict(i)) "KEEP" else "drop"
        val pen = if (b.penalized) " PEN" else ""
        val hd = if (b.isHeading) " HDG" else ""
        println(f"[$i%4d] $mark$pen$hd w=${b.words}%3d ld=${b.linkDensity}%.2f ${b.text.take(90)}")
      }
    }
  }
}
