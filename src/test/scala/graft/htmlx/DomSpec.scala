package graft.htmlx

import org.scalatest.funsuite.AnyFunSuite

class DomSpec extends AnyFunSuite {

  private val doc = HtmlParser.parseDocument(
    """<!DOCTYPE html><html><head><title>My Page</title>
      |<meta name="description" content="a demo">
      |<meta property="og:type" content="article">
      |</head><body>
      |<div id="main" class="wrap outer"><p class="intro">Hello <b>world</b></p>
      |<a href="/one">1</a><a href="/two">2</a></div>
      |<div class="wrap">second</div>
      |</body></html>""".stripMargin).doc

  test("getElementById / byTagName / byClassName") {
    assert(Dom.getElementById(doc, "main").map(_.name).contains("div"))
    assert(Dom.getElementsByTagName(doc, "a").length == 2)
    assert(Dom.getElementsByClassName(doc, "wrap").length == 2)
    assert(Dom.getElementsByClassName(doc, "outer").length == 1)
  }

  test("textContent, title, links, metaTags") {
    assert(Dom.title(doc).contains("My Page"))
    assert(Dom.getElementById(doc, "main").map(Dom.textContent).exists(_.contains("Hello world")))
    assert(Dom.links(doc) == Seq("/one", "/two"))
    val meta = Dom.metaTags(doc)
    assert(meta("description") == "a demo" && meta("og:type") == "article")
  }

  test("descendants order is document order") {
    val names = Dom.elements(doc).map(_.name).toSeq
    assert(names.take(4) == Seq("html", "head", "title", "meta"))
  }
}
