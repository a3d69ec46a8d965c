package graft.htmlx

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.extract.Extractor

/** Property tests: the engine never throws, always yields a tree, and is
  * deterministic on arbitrary tag soup (SURVEY.md §5.2-6). */
class RobustnessSpec extends AnyFunSuite {

  private val tagNames = Gen.oneOf("div", "p", "b", "i", "a", "table", "td",
    "tr", "li", "ul", "span", "svg", "math", "select", "option", "form",
    "button", "h1", "pre", "textarea", "script", "style", "frameset",
    "nobr", "custom-tag", "br", "img", "caption", "colgroup", "noscript")

  private val soupPiece: Gen[String] = Gen.oneOf(
    tagNames.map(t => s"<$t>"),
    tagNames.map(t => s"</$t>"),
    tagNames.map(t => s"<$t attr='v&amp;' x=y>"),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("&amp;", "&not", "&#x41;", "&#999999999;", "&bogus;", "&"),
    Gen.oneOf("<!--", "-->", "<!-- c -->", "<![CDATA[x]]>", "<!doctype html>",
      "<?pi?>", " ", "\r\n", "<", ">", "\"", "'", "=", "<!", "</"),
  )

  private val soup: Gen[String] =
    Gen.listOf(soupPiece).map(_.mkString)

  private def runProp(prop: Prop, n: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.toString)
  }

  test("parser never throws and is deterministic on tag soup") {
    runProp(Prop.forAll(soup) { html =>
      val r1 = HtmlParser.parseDocument(html)
      val r2 = HtmlParser.parseDocument(html)
      val ok = Serializer.html5libFormat(r1.doc) == Serializer.html5libFormat(r2.doc)
      val e1 = Extractor.extract(r1.doc)
      val e2 = Extractor.extract(r2.doc)
      ok && e1.text == e2.text
    }, 300)
  }

  test("pathological inputs parse in bounded time without overflow") {
    // 50k nested divs: depth-capped, extractor recursion stays bounded
    val deep = "<div>" * 50000 + ("survive " * 30)
    val t0 = System.nanoTime()
    val r = HtmlParser.parseDocument(deep)
    val ex = Extractor.extract(r.doc)
    assert(ex.text.contains("survive"))
    // 20k distinct formatting elements: AFE capped, reconstruction bounded
    val fmt = (0 until 20000).map(i => s"<b class=c$i>").mkString + "<p>end of the line for formatting chaos"
    val r2 = HtmlParser.parseDocument(fmt)
    assert(Extractor.extract(r2.doc).text != null)
    // 10k unclosed tables
    val tables = "<table><tr><td>" * 3000 + "x"
    assert(HtmlParser.parseDocument(tables).doc != null)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"pathological parse too slow: $sec s")
  }

  test("depth-cap degraded mode never drains the open-elements stack") {
    // At maxStackDepth inserts skip the push but several handlers still pop
    // unconditionally (isindex pops form+label, Text-mode end tags, select
    // option churn). Cycle pop-heavy constructs with refills right at the
    // cap: pre-hardening this shape walks the stack floor downward; the
    // root html entry must survive and the parse must stay deterministic.
    val deep = "<div>" * 600
    val churn = ("<isindex></form><textarea>t</textarea><select><option>o" +
      "</select><div><div><div>") * 400
    val html = deep + churn + "<p>alive"
    val r1 = HtmlParser.parseDocument(html)
    val r2 = HtmlParser.parseDocument(html)
    assert(r1.doc.children.nonEmpty)
    assert(Serializer.html5libFormat(r1.doc) == Serializer.html5libFormat(r2.doc))
    assert(graft.extract.Extractor.extract(r1.doc).text.contains("alive"))
  }

  test("engine reuse never leaks state between documents") {
    val engine = new HtmlParser.Engine
    runProp(Prop.forAll(soup, soup) { (a, b) =>
      engine.parse(a) // pollute with arbitrary soup
      val reused = Serializer.html5libFormat(engine.parse(b).doc)
      val fresh = Serializer.html5libFormat(HtmlParser.parseDocument(b).doc)
      reused == fresh
    }, 200)
  }

  test("fragment parsing never throws on tag soup") {
    runProp(Prop.forAll(soup, Gen.oneOf("div", "td", "table", "title", "script", "select")) {
      (html, ctx) =>
        val r = HtmlParser.parseFragment(html, ctx)
        Serializer.html5libFormat(r.fragment) != null
    }, 150)
  }
}
