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

  test("toHtml is roundtrip-idempotent on the corpus (inherent cases exempt)") {
    // serialize → reparse → serialize must be a fixed point, EXCEPT the two
    // DOM classes HTML cannot express: raw-text content containing its own
    // close tag, and parser-manufactured nested same-name formatting
    // elements (foster-parented <a>-in-<a>, <nobr>-in-<nobr>)
    val rawText = Set("script", "style", "xmp", "iframe", "noembed",
      "noframes", "plaintext", "noscript")
    // a/nobr: reparse re-runs the implied-close + AAA reshuffle; form: a
    // nested form only arises via the </form> pointer-reset trick
    // (h5-tests6.dat) — reparsing any serialization ignores the inner <form>
    // because the outer form pointer is set, so the DOM is unserializable
    // p: a <p> nested (at any depth) inside another <p> can only arise
    // from foster/adoption-agency restructures; its serialization
    // re-triggers the implied p-close on reparse, so the DOM has no
    // faithful HTML form. li likewise via its start-tag stack walk.
    val selfNesting = Set("a", "nobr", "form", "p", "li")
    def inherentlyUnserializable(p: HParent): Boolean = {
      def textOf(e: HElement): String = {
        val sb = new java.lang.StringBuilder
        def w(n: HNode): Unit = n match {
          case t: HText => sb.append(t.sb)
          case c: HParent => c.children.foreach(w)
          case _ => ()
        }
        e.children.foreach(w); sb.toString
      }
      def hasDescendantNamed(e: HElement, name: String): Boolean =
        e.children.exists {
          case c: HElement => (c.isHtmlNs && c.name == name) || hasDescendantNamed(c, name)
          case _ => false
        }
      val pClosers = Set("address", "article", "aside", "blockquote",
        "center", "details", "dialog", "dir", "div", "dl", "fieldset",
        "figcaption", "figure", "footer", "header", "hgroup", "main",
        "menu", "nav", "ol", "section", "summary", "ul", "pre", "listing",
        "form", "li", "dd", "dt", "h1", "h2", "h3", "h4", "h5", "h6",
        "hr", "xmp")
      val scopeShields = Set("button", "marquee", "object", "table", "td",
        "th", "caption", "applet", "template")
      def hasPCloserUnshielded(e: HElement): Boolean =
        e.children.exists {
          case c: HElement if c.isHtmlNs && scopeShields.contains(c.name) => false
          case c: HElement =>
            (c.isHtmlNs && pClosers.contains(c.name)) || hasPCloserUnshielded(c)
          case _ => false
        }
      def bad(n: HNode): Boolean = n match {
        case e: HElement =>
          (e.isHtmlNs && rawText.contains(e.name) &&
            textOf(e).toLowerCase.contains(s"</${e.name}")) ||
          // script text entering the <!--<script double-escape changes how a
          // following close tag tokenizes on reparse (entry is
          // case-insensitive: "<SCRIPT" triggers it too)
          (e.isHtmlNs && e.name == "script" && textOf(e).contains("<!--") &&
            textOf(e).toLowerCase.contains("<script")) ||
          // plaintext never terminates on reparse: lossy unless nothing
          // (not even its own close tag) follows it
          (e.isHtmlNs && e.name == "plaintext") ||
          (e.isHtmlNs && selfNesting.contains(e.name) && hasDescendantNamed(e, e.name)) ||
          // a p-closing element (div/ul/h1/...) can only sit INSIDE a <p>
          // via fostering/AAA; on reparse its start tag closes the p —
          // unless a button-scope barrier (button/marquee/object/table
          // cells) intervenes, which also blocks the reparse close
          (e.isHtmlNs && e.name == "p" && hasPCloserUnshielded(e)) ||
          e.children.exists(bad)
        case c: HParent => c.children.exists(bad)
        case _ => false
      }
      // third inherent class: quirks mode forced by a MALFORMED doctype
      // (tokenizer force-quirks flag) — the flag has no serialized form, so
      // <!DOCTYPE html junk> reparses as no-quirks
      val forcedQuirks = p match {
        case d: HDocument if d.quirksMode == "quirks" =>
          d.children.exists {
            case dt: HDoctype => dt.name == "html" &&
              (dt.publicId == null || dt.publicId.isEmpty) &&
              (dt.systemId == null || dt.systemId.isEmpty)
            case _ => false
          }
        case _ => false
      }
      forcedQuirks || bad(p)
    }

    val dir = java.nio.file.Paths.get("src/test/resources/tree-construction")
    var checked = 0
    var exempt = 0
    java.nio.file.Files.list(dir).forEach { f =>
      val lines = java.nio.file.Files.readAllLines(f).toArray(Array.empty[String])
      var i = 0
      while (i < lines.length) {
        if (lines(i) == "#data") {
          val data = new StringBuilder
          i += 1
          var first = true
          while (i < lines.length && lines(i) != "#errors") {
            if (!first) data.append('\n')
            data.append(lines(i)); first = false; i += 1
          }
          var isFragment = false
          while (i < lines.length && !lines(i).startsWith("#document")) {
            if (lines(i) == "#document-fragment") isFragment = true
            i += 1
          }
          if (!isFragment) {
            val d1 = HtmlParser.parseDocument(data.toString).doc
            if (inherentlyUnserializable(d1)) exempt += 1
            else {
              val h1 = Serializer.toHtml(d1)
              val h2 = Serializer.toHtml(HtmlParser.parseDocument(h1).doc)
              assert(h1 == h2, s"roundtrip diverged for: ${data.toString.take(100)}")
              checked += 1
            }
          }
        } else i += 1
      }
    }
    assert(checked > 400, s"expected broad coverage, checked=$checked exempt=$exempt")
  }
}
