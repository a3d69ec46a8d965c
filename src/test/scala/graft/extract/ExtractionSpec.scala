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

  test("linked words counted on collapsed anchor text, not per text node") {
    // the <b> splits the anchor text into three HText nodes but the block
    // text collapses to one word — linkDensity must use the collapsed count
    val html = "<body><p><a href='/x'>New<b>Yo</b>rk</a> is a big city</p>"
    val blocks = Extractor.segment(HtmlParser.parseDocument(html).doc)
    assert(blocks.length == 1)
    assert(blocks(0).words == 5 && blocks(0).linkedWords == 1)
    // an anchor spanning a block boundary settles its run per block
    val html2 = "<body><a href='/y'><div>alpha beta</div><div>gamma</div></a>"
    val b2 = Extractor.segment(HtmlParser.parseDocument(html2).doc)
    assert(b2.map(b => (b.words, b.linkedWords)) == Vector((2, 2), (1, 1)))
  }

  test("deterministic: same input, same output") {
    val html = new String(Files.readAllBytes(base.resolve("article-with-nav/input.html")), "UTF-8")
    val a = Extractor.extract(HtmlParser.parseDocument(html).doc)
    val b = Extractor.extract(HtmlParser.parseDocument(html).doc)
    assert(a.text == b.text && a.spans.toSeq == b.spans.toSeq)
  }

  test("negative class/id token matching") {
    assert(Extractor.hasNegativeToken("ad-banner"))
    assert(Extractor.hasNegativeToken("inline_ad"))
    assert(Extractor.hasNegativeToken("comments-area"))
    assert(Extractor.hasNegativeToken("site FOOTER"))
    assert(Extractor.hasNegativeToken("paywall-gate"))
    assert(!Extractor.hasNegativeToken("shadow"))       // 'ad' not on a boundary
    assert(!Extractor.hasNegativeToken("road-map"))
    assert(!Extractor.hasNegativeToken("article-body"))
    assert(!Extractor.hasNegativeToken("entry-content"))
    assert(!Extractor.hasNegativeToken(""))
  }

  test("negative-gate drops sandwiched boilerplate; long prose survives a misnomer") {
    val prose = "Plain sentence with enough words to be classified as standalone " +
      "content by the densitometric rules used in this extractor pipeline today."
    val html = s"<body><p>$prose</p><div class='inline-ad'>ADVERTISEMENT</div><p>$prose</p>" +
      s"<div class='footer-misnomer-ad'>$prose $prose $prose</div></body>"
    val ex = Extractor.extract(HtmlParser.parseDocument(html).doc)
    assert(!ex.text.contains("ADVERTISEMENT"), "ad slot must be dropped")
    // >= 40 words of low-link prose survives even inside a negative class
    assert(ex.text.linesIterator.size == 3)
  }

  test("heading rescue looks past metadata lines to following content") {
    val prose = "A first paragraph long enough that the word count rules classify " +
      "it as body content without any doubt in the standalone prose branch."
    val html = s"<body><article><h1>The Headline</h1><p>By A. Writer</p><p>$prose</p></article></body>"
    val ex = Extractor.extract(HtmlParser.parseDocument(html).doc)
    assert(ex.text.startsWith("The Headline\n"), s"headline missing: ${ex.text.take(60)}")
  }

  test("goldens drop known boilerplate markers (semantic, not snapshot)") {
    def golden(name: String): String =
      new String(Files.readAllBytes(base.resolve(s"$name/expected.txt")), "UTF-8")
    assert(!golden("news-site").contains("ADVERTISEMENT"))
    assert(golden("news-site").startsWith("Port Authority Approves Expansion"))
    assert(!golden("wordpress-article").contains("What grinder do you use"))
    assert(golden("wordpress-article").startsWith("How to Brew Better Coffee"))
    assert(!golden("paywall-teaser").contains("Subscribe for"))
    assert(!golden("wiki-page").contains("Free Documentation License"))
    assert(!golden("ecommerce-product").contains("Customers also bought"))
    assert(golden("forum-thread").contains("cracked exhaust heat shield"))
  }

  test("template contents never reach extracted text or links") {
    val prose = "Real article body with enough words that the densitometric rules " +
      "keep it as content in the standalone prose classification branch here."
    // Template innards include prose long enough that it WOULD be extracted if
    // it leaked into the main tree, plus nested table/row scaffolding that a
    // non-template-aware parser would foster-parent into visible positions.
    val html =
      s"""<body><article><p>$prose</p>
         |<template id=row-tpl><table><tr><td>HIDDEN CELL $prose</td></tr></table>
         |<p>HIDDEN PARA $prose</p><a href="/hidden">hidden link</a></template>
         |<p>$prose</p></article></body>""".stripMargin
    val doc = HtmlParser.parseDocument(html).doc
    val ex = Extractor.extract(doc)
    assert(!ex.text.contains("HIDDEN"), s"template innards leaked: ${ex.text}")
    assert(ex.text.linesIterator.size == 2)
    assert(Extractor.links(doc).forall(_._1 != "/hidden"))
  }

  test("links: nested anchors via foster parenting each get their own edge") {
    // the parser really does produce <a>-in-<a> here (adoption/foster):
    // the inner edge must exist and its text must not pollute the outer
    // DOM: <a href=a>["outer", <a href=b>"inner", <table>], then the AFE
    // reconstructs a fresh <a href=b> holding "tail" after the table
    val html = "<a href=\"a\">outer<table><a href=\"b\">inner</table>tail"
    val ls = Extractor.links(HtmlParser.parseDocument(html).doc)
    assert(ls.toSeq == Seq(("a", "outer"), ("b", "inner"), ("b", "tail")), ls)
  }

  test("links: ignored subtrees contribute neither text nor edges") {
    val html = "<body><a href='/x'>Read more<style>.a{color:red}</style></a>" +
      "<select><a href='/hidden'>nope</a></select>"
    val ls = Extractor.links(HtmlParser.parseDocument(html).doc)
    assert(ls.toSeq == Seq(("/x", "Read more")), ls)
  }

  test("HTML islands inside foreignObject render: text and links survive") {
    val words = (1 to 30).map(i => s"word$i").mkString(" ")
    val html = s"<body><svg><desc>svg desc text</desc><foreignObject>" +
      s"<p>$words</p><a href='http://x.example/in-fo'>fo link</a>" +
      "</foreignObject><circle>raw svg</circle></svg>"
    val doc = HtmlParser.parseDocument(html).doc
    val ex = Extractor.extract(doc)
    assert(ex.text.contains("word1") && ex.text.contains("word30"))
    assert(!ex.text.contains("raw svg"))
    assert(Extractor.links(doc).toSeq == Seq(("http://x.example/in-fo", "fo link")))
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
