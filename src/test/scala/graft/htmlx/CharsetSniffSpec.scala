package graft.htmlx

import org.scalatest.funsuite.AnyFunSuite

class CharsetSniffSpec extends AnyFunSuite {

  test("clean UTF-8 decodes as utf-8") {
    val (t, cs) = CharsetSniff.decode("<p>héllo β</p>".getBytes("UTF-8"))
    assert(cs == "utf-8" && t == "<p>héllo β</p>")
  }

  test("UTF-8 BOM stripped and wins") {
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "<p>x</p>".getBytes("UTF-8")
    val (t, cs) = CharsetSniff.decode(bytes)
    assert(cs == "utf-8" && t == "<p>x</p>")
  }

  test("UTF-16 BOMs") {
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "<p>x</p>".getBytes("UTF-16BE")
    assert(CharsetSniff.decode(be) == (("<p>x</p>", "utf-16be")))
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "<p>x</p>".getBytes("UTF-16LE")
    assert(CharsetSniff.decode(le) == (("<p>x</p>", "utf-16le")))
  }

  test("mislabeled windows-1252 bytes fall back (curly quote, e-acute)") {
    // 0x93/0x94 curly quotes + 0xE9 é are malformed as UTF-8
    val bytes = "<p>".getBytes("ASCII") ++ Array[Byte](0x93.toByte, 0xE9.toByte, 0x94.toByte) ++ "</p>".getBytes("ASCII")
    val (t, cs) = CharsetSniff.decode(bytes)
    assert(cs == "windows-1252-fallback")
    assert(t == "<p>“é”</p>")
  }

  test("declared iso-8859-1 meta charset honored (as windows-1252 per the HTML standard)") {
    val head = "<html><head><meta charset=\"iso-8859-1\"></head><body>caf"
    val bytes = head.getBytes("ASCII") ++ Array[Byte](0xE9.toByte) ++ "</body>".getBytes("ASCII")
    val (t, cs) = CharsetSniff.decode(bytes)
    assert(cs == "iso-8859-1")
    assert(t.contains("café"))
  }

  test("declared charset parsing forms") {
    def d(s: String) = CharsetSniff.declaredCharset(s.getBytes("ASCII"))
    assert(d("<meta charset=utf-8>") == Some("utf-8"))
    assert(d("<meta charset='windows-1252'>") == Some("windows-1252"))
    assert(d("<meta http-equiv=Content-Type content=\"text/html; charset=iso-8859-1\">") == Some("iso-8859-1"))
    assert(d("<p>no declaration</p>") == None)
    // only 'charset' INSIDE a <meta> tag counts: a URL query string or
    // comment before the real declaration must not supply the label
    assert(d("<a href=\"/search?charset=utf-8\">x</a><meta charset=\"iso-8859-1\">")
      == Some("iso-8859-1"))
    assert(d("<!-- charset=koi8-r --><meta charset=windows-1252>")
      == Some("windows-1252"))
    assert(d("<a href=\"?charset=utf-8\">no meta at all</a>") == None)
    // HTML whitespace (tabs/newlines) around '=' is accepted
    assert(d("<meta charset\t=\n'windows-1252'>") == Some("windows-1252"))
    // a stray apostrophe in an UNQUOTED value must not swallow the '>'
    // and let body-text 'charset=' tokens pose as declarations
    assert(d("<meta title=rock'n> <p> charset=koi8-r </p>" +
      "<meta charset=\"windows-1252\">") == Some("windows-1252"))
    // a '>' inside a quoted attribute value must not truncate the tag scan
    assert(d("<meta content=\"a > b\" charset=windows-1252>")
      == Some("windows-1252"))
    // 'charset' inside an unrelated attribute VALUE (refresh URL) is not a
    // declaration — the real one later in the tag (or a later meta) wins
    assert(d("<meta http-equiv=\"refresh\" content=\"0;url=/x?charset=utf-8\">" +
      "<meta charset=\"windows-1252\">") == Some("windows-1252"))
    assert(d("<meta http-equiv=\"refresh\" content=\"0;url=/x?charset=utf-8\">")
      == None)
  }

  test("declared but unsupported charset still falls back safely") {
    val bytes = "<meta charset=shift_jis><p>".getBytes("ASCII") ++ Array[Byte](0x93.toByte)
    val (_, cs) = CharsetSniff.decode(bytes)
    assert(cs == "windows-1252-fallback")
  }

  test("never throws on arbitrary bytes, decode is total and deterministic") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val junk = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      val a = CharsetSniff.decode(junk)
      val b = CharsetSniff.decode(junk)
      assert(a == b)
    }
  }

  test("pipeline parseOne decodeLadder: cp1252 and BOM pages end-to-end") {
    import graft.pipeline.{ExtractPipeline, SynthCorpus}
    val id = 42L
    val t = "plain ascii words plus caf\u00e9 \u201cquoted\u201d tail one two three four five six"
    val html = SynthCorpus.pageHtml(id, t)
    val expected = SynthCorpus.expectedExtract(id, t)
    // declared windows-1252
    val declared = html.replace("charset=\"utf-8\"", "charset=\"windows-1252\"")
      .getBytes("windows-1252")
    val d1 = ExtractPipeline.parseOne(SynthCorpus.url(id), declared, decodeLadder = true)
    assert(d1.ok && d1.text == expected && d1.detected_charset == "windows-1252")
    // undeclared cp1252 -> fallback
    val undeclared = html.replace("<meta charset=\"utf-8\">", "<meta name=\"g\">")
      .getBytes("windows-1252")
    val d2 = ExtractPipeline.parseOne(SynthCorpus.url(id), undeclared, decodeLadder = true)
    assert(d2.ok && d2.text == expected && d2.detected_charset == "windows-1252-fallback")
    // UTF-8 with BOM
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ html.getBytes("UTF-8")
    val d3 = ExtractPipeline.parseOne(SynthCorpus.url(id), bom, decodeLadder = true)
    assert(d3.ok && d3.text == expected && d3.detected_charset == "utf-8")
    // default path on the same UTF-8 bytes is unchanged (reference parity)
    val d4 = ExtractPipeline.parseOne(SynthCorpus.url(id), html.getBytes("UTF-8"))
    assert(d4.ok && d4.text == expected)
  }

  test("sniffed text parses: mislabeled legacy page through the engine") {
    val bytes = "<!DOCTYPE html><body><p>".getBytes("ASCII") ++
      Array[Byte](0x93.toByte) ++ "quoted".getBytes("ASCII") ++ Array[Byte](0x94.toByte) ++
      "</p>".getBytes("ASCII")
    val (text, _) = CharsetSniff.decode(bytes)
    val r = HtmlParser.parseDocument(text)
    val ex = graft.extract.Extractor.extract(r.doc)
    assert(ex.text.contains("“quoted”") || ex.text.isEmpty) // short block may be dropped
  }
}
