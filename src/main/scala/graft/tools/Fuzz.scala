package graft.tools

import graft.htmlx._
import graft.extract._

/** Hostile-markup fuzzer: random token soup biased toward the hazard
  * constructs (tables, formatting misnests, foreign content, char-refs,
  * raw-text elements, fragments). Invariants per input: parse never throws,
  * extract never throws, counts are sane, the html5lib dump is identical
  * across a fresh engine and a reused engine (reuse leaks nothing), and
  * document parses are identical run-to-run (determinism).
  * usage: Fuzz <iterations> [seed]
  */
object Fuzz {
  private val tags = Array("b", "i", "a", "div", "p", "table", "tr", "td",
    "th", "span", "u", "s", "em", "font", "nobr", "select", "option", "ul",
    "li", "svg", "math", "mi", "foreignObject", "caption", "colgroup", "col",
    "tbody", "form", "input", "button", "script", "style", "title",
    "textarea", "pre", "frameset", "frame", "h1", "h2", "ruby", "rb", "rt",
    "rtc", "marquee", "object", "xmp", "plaintext", "noscript", "template",
    "body", "html", "head", "br", "hr", "img", "dd", "dt", "li", "optgroup",
    "search", "isindex")
  private val refs = Array("&amp;", "&not", "&notin;", "&#x41;", "&#0;",
    "&#xD800;", "&bogus;", "&", "&#", "&#x", "&ltX", "&curren", "&amp")
  private val frags = Array(null, "td", "tr", "tbody", "select", "b", "p",
    "colgroup", "caption", "script", "title", "html", "frameset",
    "svg path", "math ms", "svg desc", "math annotation-xml", "template")

  def gen(r: java.util.Random): String = {
    val sb = new StringBuilder
    val n = 1 + r.nextInt(60)
    for (_ <- 0 until n) {
      r.nextInt(12) match {
        case 0 | 1 | 2 =>
          sb.append('<').append(tags(r.nextInt(tags.length)))
          if (r.nextInt(3) == 0) sb.append(" a=\"").append(r.nextInt(10)).append('"')
          if (r.nextInt(6) == 0) sb.append('/')
          if (r.nextInt(8) != 0) sb.append('>')
        case 3 | 4 =>
          sb.append("</").append(tags(r.nextInt(tags.length)))
          if (r.nextInt(8) != 0) sb.append('>')
        case 5 | 6 | 7 => sb.append("x y ").append(r.nextInt(100)).append(' ')
        case 8 => sb.append(refs(r.nextInt(refs.length)))
        case 9 => sb.append("<!--").append(if (r.nextBoolean()) "c--" else "c").append(if (r.nextBoolean()) ">" else "")
        case 10 => sb.append("<![CDATA[x]]").append(if (r.nextBoolean()) ">" else "")
        case 11 =>
          val specials = Array("<!DOCTYPE html>", "<!DOCTYPE x PUBLIC \"y\">", "\u0000", "\r\n", "<?pi?>")
          sb.append(specials(r.nextInt(specials.length)))
      }
    }
    sb.toString
  }

  /** PDF fuzz: mutated/truncated MiniPdf outputs + random binary with a
    * %PDF- prefix. Invariants: extractor never throws, is deterministic,
    * and intact generator output still roundtrips. */
  def fuzzPdf(iters: Long, seed: Long): Int = {
    val r = new java.util.Random(seed)
    var fail = 0
    var i = 0L
    while (i < iters && fail <= 5) {
      val base = graft.pdfx.MiniPdf.build(
        Seq.fill(1 + r.nextInt(4))(gen(r).take(60)), compress = r.nextBoolean())
      val bytes: Array[Byte] = r.nextInt(4) match {
        case 0 => base
        case 1 => java.util.Arrays.copyOf(base, r.nextInt(base.length + 1)) // truncate
        case 2 => // mutate random bytes
          val b = base.clone()
          for (_ <- 0 until 1 + r.nextInt(20)) b(r.nextInt(b.length)) = r.nextInt(256).toByte
          b
        case 3 => // random binary behind the magic
          val b = new Array[Byte](r.nextInt(2048))
          r.nextBytes(b)
          ("%PDF-1.4\n".getBytes ++ b)
      }
      try {
        val a = graft.pdfx.PdfTextExtractor.extract(bytes)
        val b = graft.pdfx.PdfTextExtractor.extract(bytes)
        if (a != b) { fail += 1; println(s"PDF FAIL at $i: nondeterminism") }
      } catch {
        case t: Throwable => fail += 1; println(s"PDF FAIL at $i: THROW $t")
      }
      i += 1
      if (i % 200000 == 0) println(s"pdf $i done, failures=$fail")
    }
    fail
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toLong else 100000L
    val seed = if (args.length > 1) args(1).toLong else 20260817L
    if (args.length > 2 && args(2) == "pdf") {
      val f = fuzzPdf(iters, seed)
      println(s"pdf fuzz complete: $iters inputs, $f failures")
      if (f > 0) sys.exit(1)
      return
    }
    val r = new java.util.Random(seed)
    val engine = new HtmlParser.Engine
    var i = 0L
    var fail = 0
    while (i < iters) {
      val html = HtmlParser.normalize(gen(r))
      val ctx = frags(r.nextInt(frags.length))
      try {
        if (ctx == null) {
          val fresh = HtmlParser.parseDocument(html)
          val reused = engine.parse(html)
          val d1 = Serializer.html5libFormat(fresh.doc)
          val d2 = Serializer.html5libFormat(reused.doc)
          if (d1 != d2) { fail += 1; report(i, html, "fresh-vs-reused tree mismatch", d1, d2) }
          val ex = Extractor.extract(reused.doc)
          if (ex.charCount < 0 || ex.charCount != ex.text.length) {
            fail += 1; report(i, html, s"bad charCount ${ex.charCount}", "", "")
          }
          // serializer must never throw and must itself be deterministic
          val s1 = Serializer.toHtml(reused.doc)
          val s2 = Serializer.toHtml(reused.doc)
          if (s1 != s2) { fail += 1; report(i, html, "toHtml nondeterminism", "", "") }
        } else {
          val (name, ns) =
            if (ctx.startsWith("svg ")) (ctx.substring(4), Ns.svg)
            else if (ctx.startsWith("math ")) (ctx.substring(5), Ns.mathml)
            else (ctx, Ns.html)
          val f1 = Serializer.html5libFormat(HtmlParser.parseFragment(html, name, ns).fragment)
          val f2 = Serializer.html5libFormat(HtmlParser.parseFragment(html, name, ns).fragment)
          if (f1 != f2) { fail += 1; report(i, html, s"fragment($ctx) nondeterminism", f1, f2) }
        }
      } catch {
        case t: Throwable =>
          fail += 1
          report(i, html, s"THROW ${t.getClass.getName}: ${t.getMessage} ctx=$ctx", "", "")
          if (fail > 5) { println("too many failures, stopping"); sys.exit(1) }
      }
      i += 1
      if (i % 200000 == 0) println(s"$i done, failures=$fail")
    }
    println(s"fuzz complete: $iters inputs, $fail failures")
    if (fail > 0) sys.exit(1)
  }

  private def report(i: Long, html: String, what: String, a: String, b: String): Unit = {
    println(s"FAIL at $i: $what")
    println(s"  input: ${html.replace("\n", "\\n").take(500)}")
    if (a.nonEmpty) println(s"  A:\n$a\n  B:\n$b")
  }
}
