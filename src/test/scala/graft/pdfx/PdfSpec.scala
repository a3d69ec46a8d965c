package graft.pdfx

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** PDF leg of the extraction pipeline: writer↔extractor roundtrip plus
  * hand-built streams exercising every supported operator/escape form. */
class PdfSpec extends AnyFunSuite {

  test("roundtrip: raw and FlateDecode single-page PDFs") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    for (compress <- Seq(false, true)) {
      val pdf = MiniPdf.build(MiniPdf.wrap(text, 7), compress)
      assert(PdfTextExtractor.isPdf(pdf))
      val ex = PdfTextExtractor.extract(pdf)
      assert(ex.ok)
      assert(ex.text.replace('\n', ' ') == text, s"compress=$compress")
    }
  }

  test("string escapes, hex strings, TJ arrays, quote operators") {
    val cs = ("BT /F1 12 Tf 72 720 Td (paren \\( close \\) back\\\\slash \\101) Tj\n" +
      "0 -14 Td [(arr) -120 (ay)] TJ\n" +
      "(next line via quote) '\n" +
      "<48 65 6C 6C 6F> Tj ET").getBytes(StandardCharsets.ISO_8859_1)
    val pdf = buildWith(cs)
    val ex = PdfTextExtractor.extract(pdf)
    assert(ex.lines == Seq(
      "paren ( close ) back\\slash A",
      "array",
      "next line via quoteHello"))
  }

  test("ignores non-text streams and tolerates truncation") {
    val junk = ("%PDF-1.4\n1 0 obj << /Length 5 >> stream\nABCDE\nendstream endobj\n" +
      "2 0 obj << /Length 9999 >> stream\nBT (cut").getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfTextExtractor.extract(junk)
    assert(ex.ok && ex.text == "") // no complete text stream → empty, no throw
    assert(PdfTextExtractor.extract(Array[Byte]()).text == "")
    assert(!PdfTextExtractor.isPdf("<html>".getBytes))
  }

  test("pipeline parseOne sniffs PDF magic and emits line spans") {
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val pdf = MiniPdf.build(MiniPdf.wrap(text, 5), compress = true)
    val doc = graft.pipeline.ExtractPipeline.parseOne("https://x.example/a.pdf", pdf)
    assert(doc.ok && doc.detected_charset == "pdf")
    assert(doc.text.replace('\n', ' ') == text)
    assert(doc.spans.length == 3) // 12 words / 5 per line
    doc.spans.foreach(s => assert(doc.text.substring(s.start, s.end) == doc.text.split('\n')(doc.spans.indexOf(s))))
  }

  private def buildWith(content: Array[Byte]): Array[Byte] = {
    val head = s"%PDF-1.4\n4 0 obj << /Length ${content.length} >> stream\n"
    val tail = "\nendstream endobj\n%%EOF\n"
    val out = new java.io.ByteArrayOutputStream
    out.write(head.getBytes(StandardCharsets.ISO_8859_1))
    out.write(content)
    out.write(tail.getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }
}
