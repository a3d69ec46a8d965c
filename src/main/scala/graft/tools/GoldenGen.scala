package graft.tools

import graft.htmlx.HtmlParser
import graft.extract.Extractor
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Extraction-golden authoring aid: for each fixture directory under
  * src/test/resources/extraction that has an input.html but no
  * expected.txt, runs the engine and writes expected.txt +
  * expected.spans.json. Output is REVIEWED before being committed as a
  * golden — like TreeGen, this bootstraps the snapshot; round-over-round
  * diffs of the committed goldens are the regression gate.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val base = Paths.get(if (args.nonEmpty) args(0) else "src/test/resources/extraction")
    val dirs = Files.list(base).iterator().asScala
      .filter(p => Files.exists(p.resolve("input.html"))).toSeq.sortBy(_.getFileName.toString)
    for (dir <- dirs) {
      val txt: Path = dir.resolve("expected.txt")
      if (!Files.exists(txt) || args.contains("--force")) {
        val parsed = HtmlParser.parseBytes(Files.readAllBytes(dir.resolve("input.html")))
        val ex = Extractor.extract(parsed.doc)
        Files.write(txt, ex.text.getBytes("UTF-8"))
        val spans = ex.spans.map(s => s"""{"start":${s.start},"end":${s.end},"path":"${s.path}"}""").mkString("[", ",", "]")
        Files.write(dir.resolve("expected.spans.json"), spans.getBytes("UTF-8"))
        println(s"${dir.getFileName}: ${ex.text.length} chars, ${ex.spans.length} spans")
      }
    }
  }
}
