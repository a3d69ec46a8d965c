package graft.tools
import graft.htmlx._
import graft.extract._
import java.nio.file.{Files, Paths}
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val base = Paths.get("src/test/resources/extraction")
    Files.list(base).forEach { dir =>
      val in = dir.resolve("input.html")
      if (Files.exists(in)) {
        val parsed = HtmlParser.parseBytes(Files.readAllBytes(in))
        val ex = Extractor.extract(parsed.doc)
        Files.write(dir.resolve("expected.txt"), ex.text.getBytes("UTF-8"))
        val spans = ex.spans.map(s => s"""{"start":${s.start},"end":${s.end},"path":"${s.path}"}""").mkString("[", ",", "]")
        Files.write(dir.resolve("expected.spans.json"), spans.getBytes("UTF-8"))
        println(s"${dir.getFileName}: ${ex.charCount} chars, ${ex.spans.length} spans")
      }
    }
  }
}
