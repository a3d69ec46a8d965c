package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.htmlx._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Byte-identical golden checks for the extraction layer (FIXTURES.md §5;
  * per-row invariant from BASELINE.json input_hint). */
class ExtractionSpec extends AnyFunSuite {

  private val base = Paths.get("src/test/resources/extraction")
  private val cases = Files.list(base).iterator().asScala
    .filter(p => Files.exists(p.resolve("input.html"))).toSeq.sortBy(_.getFileName.toString)

  for (dir <- cases) {
    test(s"extraction golden: ${dir.getFileName}") {
      val parsed = HtmlParser.parseBytes(Files.readAllBytes(dir.resolve("input.html")))
      val ex = Extractor.extract(parsed.doc)
      val expected = Files.readAllBytes(dir.resolve("expected.txt"))
      val actual = ex.text.getBytes("UTF-8")
      assert(java.util.Arrays.equals(actual, expected),
        s"text mismatch:\n--- expected ---\n${new String(expected, "UTF-8")}\n--- actual ---\n${ex.text}")
      val expSpans = new String(Files.readAllBytes(dir.resolve("expected.spans.json")), "UTF-8")
      val actSpans = ex.spans.map(s => s"""{"start":${s.start},"end":${s.end},"path":"${s.path}"}""").mkString("[", ",", "]")
      assert(actSpans == expSpans)
    }
  }

  test("span offsets address the extracted text") {
    val html = "<body><p>First paragraph with sufficient words to be considered content by the simple baseline classifier rules used here.</p><p>Second paragraph equally long enough to be kept as content by those same classifier rules applied again.</p>"
    val ex = Extractor.extract(HtmlParser.parseDocument(html).doc)
    assert(ex.spans.length == 2)
    ex.spans.foreach { s =>
      assert(s.start >= 0 && s.end <= ex.text.length && s.start < s.end)
    }
    assert(ex.text.substring(ex.spans(0).start, ex.spans(0).end).startsWith("First"))
    assert(ex.text.substring(ex.spans(1).start, ex.spans(1).end).startsWith("Second"))
  }

  test("deterministic: same input, same output") {
    val html = new String(Files.readAllBytes(base.resolve("article-with-nav/input.html")), "UTF-8")
    val a = Extractor.extract(HtmlParser.parseDocument(html).doc)
    val b = Extractor.extract(HtmlParser.parseDocument(html).doc)
    assert(a.text == b.text && a.spans.toSeq == b.spans.toSeq)
  }

  test("link extraction: DOM order, normalized anchors, foreign/href-less skipped") {
    val html =
      """<body><p><a href="/x">one  <b>two</b>
        |three</a> plain <a name=anchor>no href <a href="/y"></a></p>
        |<svg><a href="/svg">svg link</a></svg>
        |<table><a href="/f">fostered</a><tr><td><a href="/cell">cell</a></td></tr></table>
        |</body>""".stripMargin
    val ls = Extractor.links(HtmlParser.parseDocument(html).doc).toSeq
    assert(ls == Seq(
      ("/x", "one two three"),
      ("/y", ""),
      ("/f", "fostered"),
      ("/cell", "cell")))
  }
}
